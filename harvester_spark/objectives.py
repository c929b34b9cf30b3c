"""Declarative extraction objectives — the reference's extension point.

The harvester configures sources with an "objective": a dict of
``output_key → "$.json.path"`` (or a callable), plus an ``@``-rooted iterator
selecting the record list inside an API page
(/root/reference/harvester/products/sources/sharekit.py:165-201;
testing/sources/simple.py:4-9; applied by the seeding processor
core/processors/seed/resource.py:37-72).

Spark rebuild: ``compile_objective`` turns ``$.path`` entries into
``get_json_object`` column expressions (JVM, codegen); callables run as a
single Arrow-batched pandas stage. ``extract_seeds`` first explodes the
``@`` iterator (one page → N seeds, the UDTF shape) via a pandas stage, then
applies the compiled columns.
"""

from __future__ import annotations

import json
from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F


def compile_objective(
    objective: dict[str, str | Callable], payload_col: str = "seed_json"
) -> tuple[list[Column], dict[str, Callable]]:
    """Split an objective into JVM column exprs and pandas callables."""
    cols: list[Column] = []
    callables: dict[str, Callable] = {}
    for out, rule in objective.items():
        if out.startswith("@"):
            continue
        if callable(rule):
            callables[out] = rule
        elif isinstance(rule, str) and rule.startswith("$."):
            cols.append(F.get_json_object(F.col(payload_col), rule).alias(out))
        else:
            cols.append(F.lit(rule).alias(out))
    return cols, callables


def explode_pages(pages: DataFrame, root_path: str, payload_col: str = "payload") -> DataFrame:
    """One API page → N seed records (raw JSON strings), Arrow-batched."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for payload in pdf[payload_col]:
                doc = json.loads(payload)
                node = doc
                for part in root_path.lstrip("$.").split("."):
                    node = node.get(part, []) if isinstance(node, dict) else []
                for seed in node if isinstance(node, list) else []:
                    rows.append((json.dumps(seed, sort_keys=True),))
            yield pd.DataFrame(rows, columns=["seed_json"])

    return pages.mapInPandas(run, "seed_json string")


def extract_seeds(
    pages: DataFrame, objective: dict[str, str | Callable], payload_col: str = "payload"
) -> DataFrame:
    """Full chain: iterator explode → compiled column extraction → callables."""
    root = objective.get("@", "$.data")
    seeds = explode_pages(pages, root, payload_col)
    cols, callables = compile_objective(objective)
    out = seeds.select("seed_json", *cols) if cols else seeds
    if callables:
        names = [f.name for f in out.schema.fields]
        schema = ", ".join(
            [f"{f.name} {f.dataType.simpleString()}" for f in out.schema.fields]
            + [f"{k} string" for k in callables]
        )

        def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            for pdf in batches:
                for k, fn in callables.items():
                    pdf = pdf.assign(**{k: pdf["seed_json"].map(lambda s: fn(json.loads(s)))})
                yield pdf

        out = out.mapInPandas(run, schema)
    return out.drop("seed_json")
