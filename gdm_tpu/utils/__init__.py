"""Shared utilities: logging, profiling."""

from gdm_tpu.utils.logging import get_logger
