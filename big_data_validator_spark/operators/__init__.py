"""Validation rules and data-pipeline operators."""
