"""Composable pipeline plans (Medallion layers, Gold star schema)."""
