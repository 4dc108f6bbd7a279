"""Spark column builders: normalization, similarity, MinHash, SimHash."""
