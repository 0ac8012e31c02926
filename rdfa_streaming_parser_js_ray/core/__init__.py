"""Pure-Python RDFa 1.1 core: terms, IRI resolution, profiles, evaluator.

No Ray imports anywhere in this subpackage — it is the per-row kernel that
the Ray Data stages call inside ``map_batches``.
"""
