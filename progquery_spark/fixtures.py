"""Seeded synthetic transcript fixtures (FIXTURES.md §1) with by-construction
golden outputs.

Unlike ``datagen`` (which derives transcripts from the driver's TPC-H
parquet so DuckDB oracles can verify them), fixtures are pure-Python seeded
generators for pytest: they control alias noise (case variants + typos),
forward references, never-defined mentions, duplicate traps, and Zipf skew,
and they emit the *expected* canonical triple set alongside the input —
golden output by construction.
"""

from __future__ import annotations

import random
from dataclasses import dataclass, field
from datetime import datetime, timedelta

from .extraction import rules as R


@dataclass
class Fixture:
    rows: list[dict] = field(default_factory=list)  # transcript rows
    expected_triples: list[tuple] = field(default_factory=list)
    # canonical (conv_id, turn_idx, subj, pred, obj) — canonical keys
    alias_groups: dict[str, list[str]] = field(default_factory=dict)
    # canonical_key -> all norm-key variants that must unify


def _case_variant(rng: random.Random, name: str) -> str:
    return rng.choice([name, name.upper(), name.lower()])


def _typo(rng: random.Random, name: str) -> str:
    """Drop one alpha char before the '#' (still matches AGENT_PAT)."""
    head, _, tail = name.partition("#")
    if len(head) <= 2:
        return name
    i = rng.randrange(1, len(head))
    return head[:i] + head[i + 1 :] + "#" + tail


def make_fixture(
    n_convs: int = 8,
    seed: int = 42,
    typo_aliases: bool = False,
    forward_ref: bool = False,
    duplicate_traps: bool = False,
    zipf_lengths: bool = False,
    max_items: int = 4,
) -> Fixture:
    rng = random.Random(seed)
    fx = Fixture()
    base_ts = datetime(2025, 1, 1)

    n_customers = max(2, n_convs // 2)
    n_parts, n_suppliers, n_nations = 6, 4, 3
    customers = [f"Customer#{i:09d}" for i in range(n_customers)]
    parts = [f"{adj} {noun}" for adj, noun in
             [("red", "widget"), ("blue", "bolt"), ("small", "ring"),
              ("hot", "rod"), ("large", "plate"), ("green", "gear")][:n_parts]]
    suppliers = [f"Supplier#{i:09d}" for i in range(n_suppliers)]
    nations = [f"NATION_{i}" for i in range(n_nations)]
    prios = ["1-URGENT", "2-HIGH", "3-MEDIUM"]
    statuses = ["F", "O", "P"]

    for key, pool in (("customer", customers), ("supplier", suppliers)):
        for name in pool:
            canon = f"{key}:{name.lower()}"
            fx.alias_groups[canon] = [canon]

    for ci in range(n_convs):
        conv = f"conv-{ci}"
        okey = str(1000 + ci)
        cust = customers[ci % n_customers]
        nation = nations[ci % n_nations]
        prio = prios[ci % len(prios)]
        status = statuses[ci % len(statuses)]
        total = str(10000 + 17 * ci)

        cust_surface = _case_variant(rng, cust)
        if typo_aliases and ci % 3 == 0:
            cust_surface = _typo(rng, cust_surface)
            fx.alias_groups[f"customer:{cust.lower()}"].append(
                f"customer:{cust_surface.lower()}"
            )

        if zipf_lengths:
            n_items = max(1, min(int(rng.paretovariate(1.2)), 200))
        else:
            n_items = 1 + (ci % max_items)

        items = []
        for li in range(1, n_items + 1):
            part = parts[(ci + li) % n_parts]
            supp = suppliers[(ci * 7 + li) % n_suppliers]
            supp_surface = _case_variant(rng, supp)
            if typo_aliases and (ci + li) % 5 == 0:
                supp_surface = _typo(rng, supp_surface)
                fx.alias_groups[f"supplier:{supp.lower()}"].append(
                    f"supplier:{supp_surface.lower()}"
                )
            qty = str(1 + (ci * li) % 50)
            items.append((li, qty, part, supp_surface, supp))
        if duplicate_traps and n_items >= 2:
            # restate item 1's facts in a later turn (same part+supplier)
            li, qty, part, supp_surface, supp = items[0]
            items.append((n_items + 1, qty, part, supp_surface, supp))

        intro_text = (
            f"{R.INTRO_P0}{cust_surface}{R.INTRO_P1}{nation}"
            f"{R.INTRO_P2}{okey}{R.INTRO_P3}{prio}."
        )
        final_idx = len(items) + 1
        final_text = f"{R.FINAL_P0}{okey}{R.FINAL_P1}{total}{R.FINAL_P2}{status}."

        turn_rows = [
            dict(conv_id=conv, turn_idx=0, role="user", text=intro_text,
                 tool=None, ts=base_ts + timedelta(minutes=ci * 100)),
            dict(conv_id=conv, turn_idx=final_idx, role="assistant",
                 text=final_text, tool=None,
                 ts=base_ts + timedelta(minutes=ci * 100 + final_idx)),
        ]
        for j, (li, qty, part, supp_surface, _supp) in enumerate(items, start=1):
            turn_rows.append(
                dict(conv_id=conv, turn_idx=j, role="tool",
                     text=f"{R.ITEM_P0}{li}{R.ITEM_P1}{qty}{R.ITEM_P2}{part}"
                          f"{R.ITEM_P3}{supp_surface}.",
                     tool="order_api",
                     ts=base_ts + timedelta(minutes=ci * 100 + j))
            )
        if forward_ref and ci % 2 == 0:
            # declaration arrives *after* the references: the intro (which
            # declares the order key the item turns depend on) becomes the
            # LAST turn; the final closes at 0. Item turns then reference a
            # key declared later — the toDo-deferred-consumer analog
            # (PDGProcessing.java:42,107-114).
            turn_rows[0]["turn_idx"] = final_idx + 1
            turn_rows[1]["turn_idx"] = 0
            for tr_ in turn_rows:
                tr_["ts"] = base_ts + timedelta(minutes=ci * 100 + tr_["turn_idx"])

        fx.rows.extend(turn_rows)

        # --- expected canonical triples (by construction) -----------------
        ckey = f"customer:{cust.lower()}"
        order_key = f"order:{okey}"
        intro_idx = turn_rows[0]["turn_idx"]
        fin_idx = turn_rows[1]["turn_idx"]
        fx.expected_triples += [
            (conv, intro_idx, ckey, "from_nation", f"nation:{nation.lower()}"),
            (conv, intro_idx, ckey, "placed", order_key),
            (conv, intro_idx, order_key, "has_priority", prio),
            (conv, fin_idx, order_key, "has_total", total),
            (conv, fin_idx, order_key, "has_status", status),
        ]
        for j, (li, qty, part, supp_surface, supp) in enumerate(items, start=1):
            fx.expected_triples += [
                (conv, j, order_key, "includes", f"part:{part}"),
                (conv, j, f"part:{part}", "supplied_by", f"supplier:{supp.lower()}"),
            ]
    return fx


def to_spark(spark, fx: Fixture):
    from .schemas import TRANSCRIPT_SCHEMA

    return spark.createDataFrame(fx.rows, TRANSCRIPT_SCHEMA)
