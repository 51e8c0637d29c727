"""Pipeline constants: windows, thresholds, and the entity alias dictionary.

The alias dictionary plays the role of the reference's standoff ``.a1``
entity annotations + MUC6 ``PER_ALIAS`` expansion
(``generate_bb_training_data_2016.py:68``,
``generate_muc6_data.py:51-53``): at inference time mentions are
detected by broadcast-dictionary match (SURVEY.md §2.3 J7) instead of
gold standoff files. Surface forms are drawn from the synthetic corpus
vocabulary; NER tags mirror the reference's two-argument relation
schema (Bacteria/Habitat → OP/OBJ, relation ``acts_on`` ≙ ``Lives_In``).
"""

from __future__ import annotations

# Sliding cross-turn window bound: reference keeps k ≤ 3 (BB negatives,
# generate_bb_training_data_2016_negatives.py:727); MUC6 uses max_k=8.
MAX_K = 3

# Words per derived sentence during segmentation (synthetic corpus has
# no punctuation; the punkt-equivalent boundary is a fixed word window).
SENT_WORDS = 4

# Relation-score acceptance threshold (reference: bb2016_threshold.py).
SCORE_THRESHOLD = 0.5

# surface form -> (canonical entity id, ner tag)
# OP ≙ relation subject type (Bacteria-analogue),
# OBJ ≙ relation object type (Habitat-analogue).
ENTITY_ALIASES: dict[str, tuple[str, str]] = {
    # operators / agents
    "scan": ("SCAN", "OP"),
    "join": ("JOIN", "OP"),
    "filter": ("FILTER", "OP"),
    "sort": ("SORT", "OP"),
    "merge": ("MERGE", "OP"),
    "group": ("GROUP", "OP"),
    "window": ("WINDOW", "OP"),
    "hash": ("HASH", "OP"),
    "spark": ("SPARK", "OP"),
    # objects / locations
    "table": ("TABLE", "OBJ"),
    "row": ("ROW", "OBJ"),
    "data": ("DATA", "OBJ"),
    "customer": ("CUSTOMER", "OBJ"),
    "part": ("PART", "OBJ"),
    "order": ("ORDER", "OBJ"),
    "line": ("LINE", "OBJ"),
    "batch": ("BATCH", "OBJ"),
    "stream": ("STREAM", "OBJ"),
    "value": ("VALUE", "OBJ"),
    "query": ("QUERY", "OBJ"),
    "key": ("KEY", "OBJ"),
}

PREDICATE = "acts_on"


def alias_rows() -> list[tuple[str, str, str]]:
    """(surface, entity_id, ner_tag) rows, deterministic order."""
    return [(s, e, t) for s, (e, t) in sorted(ENTITY_ALIASES.items())]


def duck_alias_values() -> str:
    """DuckDB VALUES list for the alias dictionary."""
    rows = ", ".join(f"('{s}', '{e}', '{t}')" for s, e, t in alias_rows())
    return f"(VALUES {rows}) AS alias_dict(surface, entity_id, ner_tag)"
