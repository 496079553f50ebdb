"""Pipeline stages: each is a ``map_batches`` callable (stateless task fn or
stateful actor-pool class) over Arrow batches, or a groupby-shuffle helper."""
