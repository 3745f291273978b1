"""Reusable engine operators (SURVEY.md §2 inventory + north-star extensions)."""
