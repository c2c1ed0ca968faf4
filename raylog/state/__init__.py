"""Run state: partition manifest (checkpoint/resume) + per-stage metrics."""

from raylog.state.manifest import Manifest  # noqa: F401
