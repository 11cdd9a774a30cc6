"""Eval & calibration harness — the parity oracle (reference: eval/).

Consumes the reference's YAML query banks unchanged (eval/queries_cmhc*.yaml,
queries_gate_contours.yaml — pointed at by Config.eval_bank_dir) plus a
hermetic toy bank for air-gapped tests.
"""
from mobius_rag_tpu.eval_harness.bank import Bank, load_bank  # noqa: F401
from mobius_rag_tpu.eval_harness.fact_checker import check_facts  # noqa: F401
from mobius_rag_tpu.eval_harness.judge import judge_answer  # noqa: F401
