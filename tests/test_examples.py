"""Smoke coverage for the five examples/ demo scripts (VERDICT r7
item 7): they were the only Python in the repo pytest never imported,
so an operator-signature change could rot them silently. Each demo's
``main()`` runs in-process against the shared test session
(``get_session`` is getOrCreate, and no demo calls ``spark.stop()``)
at the smallest SF, and must complete while printing something — the
demos' own ``.show()``/assert lines are the per-stage checks; this
suite pins that they still execute end-to-end.
"""

from __future__ import annotations

import importlib
import os
import sys

import pytest

EXAMPLES = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "examples"
)

SF_DEMOS = [
    ("ann_demo", "/root/testdata/sf0.001"),
    ("curation_demo", "/root/testdata/sf0.001"),
    ("pretrain_prep_demo", "/root/testdata/sf0.001"),
    ("retrieval_demo", "/root/testdata/sf0.001"),
]


def _import(mod_name: str):
    if EXAMPLES not in sys.path:
        sys.path.insert(0, EXAMPLES)
    return importlib.import_module(mod_name)


@pytest.mark.parametrize("mod_name,sf_dir", SF_DEMOS)
def test_sf_demo_runs(spark, capsys, monkeypatch, mod_name, sf_dir):
    mod = _import(mod_name)
    monkeypatch.setattr(sys, "argv", [f"{mod_name}.py", sf_dir])
    mod.main()
    out = capsys.readouterr().out
    assert out.strip(), f"{mod_name} printed nothing"


def test_pipeline_demo_runs(spark, capsys):
    mod = _import("pipeline_demo")
    mod.main(2_000)  # synthetic trades, no sf_dir
    out = capsys.readouterr().out
    assert out.strip(), "pipeline_demo printed nothing"
