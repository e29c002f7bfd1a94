"""Placeholder — queries registered incrementally."""
