"""Sources: transcript reader + deterministic synthetic fixture generator."""
