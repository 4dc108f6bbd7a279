"""Dedup operators: blocking, candidates, verify, components, election."""
