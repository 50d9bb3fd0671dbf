"""DataFrame operators: nodes, assembly, PIP, tiles, tags, skew, dedup."""
