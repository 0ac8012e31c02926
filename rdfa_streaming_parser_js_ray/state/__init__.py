"""Checkpoint manifests and resumable-partition bookkeeping."""
