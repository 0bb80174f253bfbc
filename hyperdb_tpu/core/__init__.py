"""Core document model: nested-path resolution, chunking, state, DB facade."""
