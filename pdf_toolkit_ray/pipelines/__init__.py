"""Pipeline builders (lazy Ray Datasets; the caller owns the Ray session)."""
