"""Vectorized scalar-function library used inside ``map_batches`` stages."""
