"""Mention/triple extraction rules — the single source of truth.

The reference hard-codes its extraction rules as ~48 visit* methods over the
javac AST (ASTTypesVisitor.java:41-1582, SURVEY.md §2.2 E1-E10). Our analog
is a closed set of turn templates with regex extractors. This module is
imported by three consumers so they can never drift:

  1. ``datagen``            — renders turn text from these templates,
  2. ``extraction.extract`` — the Spark mapInPandas extractor (regex side),
  3. ``oracle``             — generates the DuckDB oracle SQL whose span
                              arithmetic uses the same literal lengths.

Span convention: 0-based char offsets, end-exclusive, computed
*arithmetically* from template-segment lengths (never via substring search,
which is ambiguous when e.g. the order key's digits also appear inside the
total). The reference's analog is javac's LineMap positions
(utils/JavacInfo.java:51-68).
"""

from __future__ import annotations

import re

# --- template segments (shared with datagen's SQL renderer) ---------------
INTRO_P0 = "Hello, I am "
INTRO_P1 = " from "
INTRO_P2 = ". I want to place order "
INTRO_P3 = " with priority "
ITEM_P0 = "Added item "
ITEM_P1 = ": "
ITEM_P2 = " units of "
ITEM_P3 = " supplied by "
FINAL_P0 = "Order "
FINAL_P1 = " total is "
FINAL_P2 = " with status "
DOT = "."

# --- surface sub-patterns ---------------------------------------------------
AGENT_PAT = r"[A-Za-z]+#\d+"  # Customer#000000001 and case variants
NATION_PAT = r"\w+"
INT_PAT = r"-?\d+"
PART_PAT = r".+?"
STATUS_PAT = r"[A-Z]"
PRIO_PAT = r".+"

INTRO_RE = re.compile(
    rf"^{re.escape(INTRO_P0)}({AGENT_PAT}){re.escape(INTRO_P1)}({NATION_PAT})"
    rf"{re.escape(INTRO_P2)}(\d+){re.escape(INTRO_P3)}({PRIO_PAT})\{DOT}$"
)
ITEM_RE = re.compile(
    rf"^{re.escape(ITEM_P0)}(\d+){re.escape(ITEM_P1)}(\d+)"
    rf"{re.escape(ITEM_P2)}({PART_PAT}){re.escape(ITEM_P3)}({AGENT_PAT})\{DOT}$"
)
FINAL_RE = re.compile(
    rf"^{re.escape(FINAL_P0)}(\d+){re.escape(FINAL_P1)}({INT_PAT})"
    rf"{re.escape(FINAL_P2)}({STATUS_PAT})\{DOT}$"
)

# entity-key prefixes (closed vocabulary, schemas.MENTION_TYPES)
PFX = {
    "customer": "customer:",
    "nation": "nation:",
    "order": "order:",
    "part": "part:",
    "supplier": "supplier:",
}


def norm_key(mention_type: str, surface: str) -> str:
    """Normalization key = the exact-linking join key (reference analog:
    fullyQualifiedName, utils/MethodNameInfo.java:20-32). Case-insensitive
    for entities; literals keep their surface verbatim."""
    if mention_type in PFX:
        return PFX[mention_type] + surface.lower()
    return "lit:" + surface
