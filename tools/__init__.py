"""Offline tools: TPU probes, fidelity harness (not part of omg_tpu)."""
