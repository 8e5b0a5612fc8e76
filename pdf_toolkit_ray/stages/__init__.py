"""Ray Data stages: stateless key/filter maps + the stateful extraction
actor pool + the per-group finalize/write transforms."""
