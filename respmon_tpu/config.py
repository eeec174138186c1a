"""Frozen, hashable configuration for the monitor pipeline.

Mirrors every hyperparameter of the reference monitor with identical defaults
(reference base.py:21-34 constructor kwargs + base.py:54-106 hardcoded
hyperparameters + base.py:548-551 ``locate`` defaults).  The dataclasses are
frozen so a config instance can be passed as a ``static_argnum`` to ``jax.jit``.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Optional, Tuple


@dataclasses.dataclass(frozen=True)
class FeatureParams:
    """Shi-Tomasi corner detection parameters (reference base.py:91-94)."""

    max_corners: int = 100
    quality_level: float = 0.3
    min_distance: float = 7.0
    block_size: int = 7


@dataclasses.dataclass(frozen=True)
class LKParams:
    """Pyramidal Lucas-Kanade parameters (reference base.py:96-98)."""

    win_size: Tuple[int, int] = (15, 15)
    max_level: int = 2
    max_iters: int = 10          # cv2.TERM_CRITERIA_COUNT, 10
    epsilon: float = 0.03        # cv2.TERM_CRITERIA_EPS, 0.03


@dataclasses.dataclass(frozen=True)
class CalibrationConfig:
    """EVM ROI localization parameters.

    Defaults follow reference base.py:80-85 (monitor-level) and
    base.py:548-551 (``locate`` signature defaults).
    """

    buffer_length: int = 128            # calibration_buffer_target_length
    freq_min: float = 0.1
    freq_max: float = 1.0
    amplification: float = 500.0
    pyramid_levels: int = 9
    skip_levels_at_top: int = 4
    temporal_threshold: float = 0.7     # suppress-top window proportion
    threshold: float = 0.08             # binary threshold (x255 at use site)
    maximum_bounding_box_area: float = math.inf
    # The reference's EVM accepts a pluggable temporal filter
    # (transforms.py:146 `temporal_filter_function`); 'fft' is the production
    # default, 'iir' the order-6 Butterworth alternative (as SOS for f32).
    temporal_filter: str = "fft"


@dataclasses.dataclass(frozen=True)
class MeasureConfig:
    """Measurement / BPM-estimation parameters (reference base.py:88-106)."""

    buffer_length: int = 128            # measure_buffer_length
    confidence_interval: float = 0.95
    gaussian_cutoff: float = 10.0
    filter_order: int = 3
    initialization_length: int = 12     # samples before BPM estimation starts
    peak_threshold: float = 0.3         # peakutils.indexes default `thres`
    max_peaks: int = 32                 # static cap on candidate peaks (masked)
    # Hybrid f64 refinement of WILD accepted gauss fits (VERDICT r4 #3):
    # the f32 LM's loose ftol accepts huge extrapolated Gaussians (center
    # many window-spans outside, |ampl| >> data) on windows where scipy's
    # f64 path exhausts maxfev and the reference DROPS the peak — one such
    # extra peak moves BPM by several units.  Suspect lanes (accepted AND
    # center > 2 spans outside OR |ampl| > 5x data) re-fit in emulated f64
    # at MINPACK tolerances; measured on the trace corpus this fixes 28/32
    # flips at 6/1532 legitimate accepts lost (bench.py --bpm-corpus).
    f64_refine: bool = True


@dataclasses.dataclass(frozen=True)
class MonitorConfig:
    """Top-level monitor configuration.

    Constructor-kwarg tier of the reference (base.py:21-34) plus the nested
    hyperparameter groups.  ``validate()`` reproduces the reference's assert
    semantics.
    """

    fps_limit: float = 10.0
    error_reset_delay: float = 10.0
    save_all_data: bool = True
    save_calibration_image: bool = False
    visualize: Optional[str] = "pyqtgraph"
    fig_size: Optional[Tuple[int, int]] = None
    motion_extraction_method: str = "average"
    disable_error_detection: bool = False

    calibration: CalibrationConfig = CalibrationConfig()
    measure: MeasureConfig = MeasureConfig()
    features: FeatureParams = FeatureParams()
    lk: LKParams = LKParams()

    # Pipeline-level knobs (new; no reference analog).
    compute_dtype: str = "float32"      # device compute dtype
    roi_bucket: int = 32                # ROI dims rounded up to this multiple
                                        # to bound jit recompiles
    # Streaming ROI mode (pipeline/streaming.py productized as a monitor
    # mode; precedent: the reference's incremental sliding-window EVM
    # prototype, prototypes/locating.py:94-147).  When enabled, the monitor
    # keeps a rolling pyramid ring during measurement and re-locks the ROI
    # onto the localizer's current bbox every ``streaming_interval`` frames
    # once its center drifts > ``streaming_drift_px`` — a moving subject is
    # followed continuously instead of degrading into the error-reset
    # cycle.  Tracked flow points shift with the window (same physical
    # pixels); if every point leaves the new window, corners re-detect on
    # the next frame without an error state.
    streaming_roi: bool = False
    streaming_interval: int = 8         # frames between streaming updates
    streaming_drift_px: float = 4.0     # min center drift to re-lock
    # Fleet BPM f64 refinement (parallel/streams.py): the hybrid wild-fit
    # refinement (MeasureConfig.f64_refine) re-fits suspect gauss lanes in
    # EMULATED f64 — and a single persistent suspect lane anywhere in the
    # fleet batch makes every lockstep step pay the refit while_loop
    # (measured: the 16x720p fleet segment went 9.2 -> 43.5 ms/step with
    # refinement on; clean-signal rings hold ~2 persistent wild lanes per
    # 16 streams).  Fleets default OFF: they accept the pre-refinement
    # envelope (isolated single-step BPM transients on 4/120 corpus
    # traces — BENCHMARKS.md §End-to-end BPM decision envelope) for ~4x
    # step throughput.  Set True for parity-critical fleets; the
    # single-stream monitor and the whole-clip scan path always follow
    # MeasureConfig.f64_refine (default on).
    fleet_f64_refine: bool = False
    # Fleet LK prev-window extraction (parallel/streams.py): False (default)
    # uses the MXU throughput mode ('onehot1') on TPU — ~12 ms faster per
    # 64x1080p fleet step than the per-point slice gathers, with tracked
    # points ulp-seeded against the single-stream path (divergence of the
    # same class as cv2's own SIMD-variant spread; status decisions and
    # cv2-tolerance parity unaffected).  True forces the exact slice path:
    # fleet steps then reproduce the single-stream monitor bit-for-bit.
    fleet_exact_lk: bool = False

    def validate(self) -> "MonitorConfig":
        """Assert-based validation matching reference base.py:24-34."""
        assert isinstance(self.fps_limit, (int, float)) and self.fps_limit > 0, \
            "fps_limit must be a positive int or float"
        assert isinstance(self.save_calibration_image, bool), \
            "save_calibration_image must be bool"
        assert self.visualize == "pyqtgraph" or self.visualize is None, \
            "visualize must be 'pyqtgraph' or None"
        assert self.fig_size is None or (
            isinstance(self.fig_size, (tuple, list)) and len(self.fig_size) == 2
        ), "fig_size should be None or length 2 tuple or list"
        assert isinstance(self.error_reset_delay, (int, float)) and \
            self.error_reset_delay >= 0, \
            "error_reset_delay must be a positive int or float"
        assert isinstance(self.save_all_data, bool), "save_all_data should be bool"
        assert self.motion_extraction_method in ("average", "flow"), \
            "motion_extraction_method must be 'average' or 'flow'"
        return self

    def peak_minimum_sample_distance(self, fps: float) -> int:
        """FPS-dependent min peak distance (reference base.py:441)."""
        return int(math.floor(fps / self.calibration.freq_max))
