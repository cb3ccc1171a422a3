"""Accuracy oracle, timing harness, logging and reporting utilities."""
