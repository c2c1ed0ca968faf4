"""Sinks: single-pass fan-out parquet writer + aggregate partials."""

from raylog.sinks.writer import SinkWriter, run_to_sinks  # noqa: F401
