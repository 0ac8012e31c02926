"""Basic-graph-pattern matching over a triples Dataset.

The KG pipeline (pipelines/kg.py) materializes triples with the schema
(subj, pred, obj_kind, obj_value, ...); the natural follow-on question is
a conjunctive query — "every ?d with dc:source X, give me its ?title" —
i.e. a SPARQL basic graph pattern.  Expressed Ray-Data-first:

- each triple pattern is ONE vectorized filter + projection over the
  triples Dataset (constants prune, variables project);
- patterns are combined left-to-right with the partitioned
  :func:`~..stages.joins.hash_join` on their shared variables (a
  composite key column when they share more than one) — every step is a
  single bounded exchange, nothing driver-side;
- a pattern sharing NO variable with the accumulated prefix is a cross
  product and is rejected (order the patterns so each one connects,
  as every SPARQL optimizer does).

Variables are spelled ``?name``.  Supported positions: subject,
predicate, object (= ``obj_value``).  Returns a Dataset with one column
per variable.
"""

from __future__ import annotations

import pandas as pd


_POSITIONS = ("subj", "pred", "obj_value")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _match_pattern(triples_ds, pattern):
    """One triple pattern → Dataset with a column per variable."""
    varmap = {}   # triples column -> output variable name
    consts = {}   # triples column -> required constant
    for col, term in zip(_POSITIONS, pattern):
        if _is_var(term):
            if term[1:] in varmap.values():
                raise ValueError(
                    f"variable {term} repeated inside one pattern")
            varmap[col] = term[1:]
        elif term is not None:
            consts[col] = term
    if not varmap:
        raise ValueError(f"pattern {pattern!r} binds no variable")

    def f(batch: pd.DataFrame) -> pd.DataFrame:
        mask = None
        for col, want in consts.items():
            m = batch[col] == want
            mask = m if mask is None else (mask & m)
        b = batch if mask is None else batch[mask]
        return b[list(varmap)].rename(columns=varmap)

    return triples_ds.map_batches(f, batch_format="pandas")


def bgp_match(triples_ds, patterns, num_buckets: int | None = None):
    """Match a conjunction of triple patterns; see module docstring.

    ``patterns``: list of (subject, predicate, object) where each term is
    a ``?var`` or a constant (None = unconstrained, unbound).
    """
    from .joins import hash_join

    if not patterns:
        raise ValueError("empty pattern list")
    acc = _match_pattern(triples_ds, patterns[0])
    bound = set(acc.schema().names)
    for pat in patterns[1:]:
        nxt = _match_pattern(triples_ds, pat)
        nxt_vars = set(nxt.schema().names)
        shared = sorted(bound & nxt_vars)
        if not shared:
            raise ValueError(
                f"pattern {pat!r} shares no variable with the prefix "
                f"({sorted(bound)}) — reorder patterns to stay connected")
        if len(shared) == 1:
            acc = hash_join(acc, nxt, on=shared[0],
                            num_buckets=num_buckets)
        else:
            sep = "\x1f"

            def add_key(cols):
                def f(batch: pd.DataFrame) -> pd.DataFrame:
                    batch = batch.copy()
                    key = batch[cols[0]].astype(str)
                    for c in cols[1:]:
                        key = key + sep + batch[c].astype(str)
                    batch["_bgpk"] = key
                    return batch
                return f

            acc = hash_join(
                acc.map_batches(add_key(shared), batch_format="pandas"),
                nxt.map_batches(add_key(shared), batch_format="pandas")
                   .drop_columns(shared),
                on="_bgpk", num_buckets=num_buckets) \
                .drop_columns(["_bgpk"])
        bound |= nxt_vars
    return acc
