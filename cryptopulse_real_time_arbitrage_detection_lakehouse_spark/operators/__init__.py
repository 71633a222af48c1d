"""Medallion + analytics operators: pure DataFrame -> DataFrame transforms."""
