"""Distributed state: membership filters, seen-set shards, checkpoints."""
