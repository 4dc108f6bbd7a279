"""Pipeline assembly + checkpoint/resume (C8)."""
