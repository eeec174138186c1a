"""Host-side runtime: the monitor state machine and streaming drivers."""

from respmon_tpu.runtime.fleet_feeder import FleetBatch, FleetFeeder
from respmon_tpu.runtime.monitor import RespiratoryMonitor

__all__ = ["FleetBatch", "FleetFeeder", "RespiratoryMonitor"]
