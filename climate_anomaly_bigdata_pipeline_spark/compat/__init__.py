"""Host-environment compatibility bridges (optional, import-try gated)."""
