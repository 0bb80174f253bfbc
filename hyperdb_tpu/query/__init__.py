"""Query side: filter pipeline (masks), engine, and LRU result cache."""
