"""Relational operators: blocking, scoring, clustering, dedup, ANN, assembly."""
