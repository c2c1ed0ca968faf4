"""Input sources: parquet readers + the deterministic sequence synthesizer."""

from raylog.sources.reader import read_sequences  # noqa: F401
from raylog.sources.synth import synthesize_sequences, synth_sources  # noqa: F401
