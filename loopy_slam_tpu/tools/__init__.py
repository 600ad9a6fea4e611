"""Evaluation CLIs: ATE, rendering metrics, mesh reconstruction metrics."""
