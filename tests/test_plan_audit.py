"""Runs the full physical-plan audit (scripts/plan_audit.py) inside the
suite, so any plan-shape regression fails pytest directly — not just the
standalone script.  The checked-in PLAN_AUDIT.md is NOT rewritten here
(that stays the script's job, at sf0.01); this test only asserts the
contracts against the suite's sf_dir (plans are shape-stable across SFs).
"""

import importlib.util
import os


def test_all_plan_contracts_hold(spark, sf_dir):
    spec = importlib.util.spec_from_file_location(
        "plan_audit",
        os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "scripts",
            "plan_audit.py",
        ),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    failures = mod.run_audit(spark, sf_dir, write_md=False)
    assert failures == []
