"""Whole-surface plan audit as a regression gate (round 11): every
declared query's optimized plan must stay free of unexpected Python
stages and unexpected cartesian/nested-loop joins — the two smells
that silently kill a plan at 100 TB. The allowlists live in
tools/audit_plans.py next to the reasons (Arrow library boundaries;
1-row scalar-subquery riders; the one documented bounded all-pairs
band), so adding a new exception requires writing down why."""

import importlib.util
import os

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_every_declared_query_passes_plan_audit(spark, sf_dir):
    spec = importlib.util.spec_from_file_location(
        "audit_plans", os.path.join(ROOT, "tools", "audit_plans.py")
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    records, bad = mod.audit(spark, sf_dir)
    assert not bad, f"plan-audit violations: {bad}"
    assert len(records) == len(mod.entry_mod.queries())
