"""Camera-native uint8 ingest parity (clip paths + calibration).

Cameras emit uint8; the float-[0,1] convention quadruples H2D upload for
no information.  These tests pin the u8 ingest's bit-level contract:

- ``uint8_to_float`` (f32) is the exact f32 image of the reference's f64
  conversion chain (transforms.py:20-23) for all 256 bytes, and the float
  path's ``trunc(f * 255)`` lattice reconstruction recovers every byte —
  so u8-ingested flow pipelines are BIT-IDENTICAL to float-ingested ones.
- ``evm.locate``/``scan.process_clip``/``scan.measure_clip`` accept u8 and
  match their float-path results (exactly where structurally guaranteed).
- The sharded locate variants accept u8 buffers on the virtual mesh.

(The fleet step's u8 ingest is covered in tests/test_parallel.py.)
"""

import numpy as np
import pytest

import jax.numpy as jnp

from respmon_tpu.config import CalibrationConfig, MonitorConfig
from respmon_tpu.io.synthetic import breathing_clip
from respmon_tpu.ops.dtype import uint8_to_float
from respmon_tpu.pipeline import evm, scan

FPS = 10.0
CAL = CalibrationConfig(buffer_length=64, pyramid_levels=6,
                        skip_levels_at_top=2)


def _quantize(clip_f):
    """Synthetic float clip -> the u8 frames a camera would have produced."""
    return np.clip(np.round(clip_f * 255.0), 0, 255).astype(np.uint8)


def _host_convert(clip_u8):
    """The host capture/reference conversion chain (io/capture.py:52-53,
    reference transforms.py:20-23): f64 multiply, then the monitor's f32
    compute cast."""
    return (clip_u8.astype(np.float64) * (1.0 / 255.0)).astype(np.float32)


@pytest.fixture(scope="module")
def clips():
    clip_f = breathing_clip(num_frames=64 + 2 + 60, height=120, width=160,
                            fps=FPS, bpm=18.0, patch_center=(60, 80),
                            patch_size=(30, 40), amplitude=0.12,
                            motion_px=2.0)
    clip_u8 = _quantize(clip_f)
    return clip_u8, _host_convert(clip_u8)


def test_uint8_to_float_f32_bit_equals_reference_chain():
    import jax

    b = np.arange(256, dtype=np.uint8)
    want = (b.astype(np.float64) * (1.0 / 255.0)).astype(np.float32)
    # BOTH eager and JITTED must match: XLA's algebraic simplifier rewrites
    # naive formulations under jit (x/255 -> x*(1/255); it even collapses
    # an unprotected Newton correction), so eager-only equality is a trap —
    # every production path is jitted.
    for tag, fn in (("eager", uint8_to_float),
                    ("jit", jax.jit(uint8_to_float, static_argnums=1))):
        got = np.asarray(fn(jnp.asarray(b), jnp.float32))
        assert got.dtype == np.float32, tag
        assert np.array_equal(got.view(np.uint32), want.view(np.uint32)), tag
    # f64 output reproduces the reference multiply verbatim.
    want64 = b.astype(np.float64) * (1.0 / 255.0)
    got64 = np.asarray(uint8_to_float(jnp.asarray(b), jnp.float64))
    assert np.array_equal(got64.view(np.uint64), want64.view(np.uint64))


def test_u8_lattice_roundtrip_reconstructs_every_byte():
    # The float flow path runs trunc(f * 255) on f32 frames; with
    # f = uint8_to_float(b) this must reconstruct b exactly, which is what
    # makes u8-ingest flow pipelines bit-identical to float-ingest ones.
    b = np.arange(256, dtype=np.uint8)
    f = np.asarray(uint8_to_float(jnp.asarray(b), jnp.float32))
    lattice = np.trunc(f * np.float32(255.0))
    assert np.array_equal(lattice.astype(np.uint8), b)


def test_locate_u8_bit_equals_float_path(clips):
    clip_u8, clip_f = clips
    r_u8 = evm.locate(jnp.asarray(clip_u8[:64]), FPS, CAL)
    r_f = evm.locate(jnp.asarray(clip_f[:64]), FPS, CAL)
    assert bool(r_u8.found) and bool(r_f.found)
    assert (int(r_u8.x), int(r_u8.y), int(r_u8.w), int(r_u8.h)) == \
        (int(r_f.x), int(r_f.y), int(r_f.w), int(r_f.h))
    assert np.array_equal(np.asarray(r_u8.heatmap_u8),
                          np.asarray(r_f.heatmap_u8))
    assert np.array_equal(np.asarray(r_u8.thresh), np.asarray(r_f.thresh))


def test_process_clip_flow_u8_bit_equals_float_path(clips):
    clip_u8, clip_f = clips
    cfg = MonitorConfig(motion_extraction_method="flow", calibration=CAL)
    r_u8 = scan.process_clip(clip_u8, FPS, cfg)
    r_f = scan.process_clip(clip_f, FPS, cfg)
    assert r_u8.found and r_f.found
    assert r_u8.roi == r_f.roi
    s_u8 = np.asarray(r_u8.measure.samples)
    s_f = np.asarray(r_f.measure.samples)
    # Identical u8-lattice crops -> identical LK/PCA programs -> bit-equal.
    assert np.array_equal(s_u8, s_f, equal_nan=True)
    assert np.array_equal(np.asarray(r_u8.measure.bpm)[
                              np.asarray(r_u8.measure.has_bpm)],
                          np.asarray(r_f.measure.bpm)[
                              np.asarray(r_f.measure.has_bpm)])
    assert abs(r_u8.final_bpm - 18.0) <= 1.0


def test_measure_clip_average_u8_matches_float_path(clips):
    clip_u8, clip_f = clips
    cfg = MonitorConfig(calibration=CAL)
    r_u8 = scan.process_clip(clip_u8, FPS, cfg)
    r_f = scan.process_clip(clip_f, FPS, cfg)
    assert r_u8.found and r_u8.roi == r_f.roi
    # Average mode sums the exact integer lattice and rescales once — an
    # intentional FP reordering of the float path's converted-pixel sum
    # (ULP-level; the integer sum is the more exact formulation).
    np.testing.assert_allclose(np.asarray(r_u8.measure.samples),
                               np.asarray(r_f.measure.samples),
                               rtol=0, atol=1e-6)


def test_measure_clip_average_u8_matches_streaming_u8_step():
    # The scan's u8 average formulation must stay in lockstep with
    # motion.measure_step's u8 ingest (same sum-then-rescale ordering).
    from respmon_tpu.pipeline import motion
    from respmon_tpu.ops import filters

    rng = np.random.default_rng(3)
    frames_u8 = rng.integers(0, 256, (12, 48, 64), dtype=np.uint8)
    cfg = MonitorConfig()
    spec = motion.MeasureSpec.for_roi(cfg, 48, 64, 20, 16, FPS)
    roi = jnp.asarray([10, 8, 20, 16])
    coeffs = filters.design_butter_lowpass(0.5, FPS,
                                           cfg.measure.filter_order)
    res = scan.measure_clip(jnp.asarray(frames_u8), roi, spec, coeffs, 10,
                            cfg.measure, estimate_every_frame=False)

    state = motion.init_state(spec, (10, 8, 20, 16), dtype=jnp.float32)
    seq = []
    for i in range(12):
        state, sample = motion.measure_step(state, jnp.asarray(frames_u8[i]),
                                            spec)
        seq.append(float(sample))
    assert np.array_equal(np.asarray(res.samples, np.float32),
                          np.asarray(seq, np.float32))


def test_sharded_locates_accept_u8():
    import jax

    from respmon_tpu.parallel.mesh import make_mesh
    from respmon_tpu.parallel.spatial import locate_wsharded
    from respmon_tpu.parallel.temporal import locate_tsharded

    cfg = CalibrationConfig(buffer_length=16, pyramid_levels=3,
                            skip_levels_at_top=1)
    n = 4
    devices = jax.devices()[:n]

    w = 16 * n
    clip_f = breathing_clip(num_frames=16, height=32, width=w, fps=FPS,
                            bpm=20.0, patch_center=(16, w // 2),
                            patch_size=(10, 12), amplitude=0.25, noise=0.002)
    clip_u8 = _quantize(clip_f)
    ref = evm.locate(jnp.asarray(_host_convert(clip_u8)), FPS, cfg)

    mesh_w = make_mesh(axis_sizes=(n,), axis_names=("space",),
                       devices=devices)
    r_w = locate_wsharded(jnp.asarray(clip_u8), mesh_w, FPS, cfg,
                          axis="space")
    assert bool(r_w.found) == bool(ref.found)
    assert (int(r_w.x), int(r_w.y), int(r_w.w), int(r_w.h)) == \
        (int(ref.x), int(ref.y), int(ref.w), int(ref.h))

    mesh_t = make_mesh(axis_sizes=(n,), axis_names=("time",),
                       devices=devices)
    r_t = locate_tsharded(jnp.asarray(clip_u8), mesh_t, FPS, cfg,
                          axis="time")
    assert bool(r_t.found) == bool(ref.found)
    assert (int(r_t.x), int(r_t.y), int(r_t.w), int(r_t.h)) == \
        (int(ref.x), int(ref.y), int(ref.w), int(ref.h))


def test_ingest_frames_contract():
    from respmon_tpu.ops.dtype import ingest_frames

    u8 = np.zeros((2, 4, 4), np.uint8)
    f = np.zeros((2, 4, 4), np.float64)
    assert ingest_frames(u8, jnp.float32).dtype == jnp.uint8   # bytes ship
    assert ingest_frames(f, jnp.float32).dtype == jnp.float32
    # u8 ingest implies f32 compute — anything else is an explicit error,
    # not a silent downgrade.
    with pytest.raises(ValueError):
        ingest_frames(u8, jnp.float64)


def test_monitor_u8_capture_bit_equals_float_monitor(clips):
    """Full RespiratoryMonitor on a camera-native uint8 ArrayCapture vs the
    float-converted capture of the SAME bytes: the u8 path crops bytes and
    widens on the exact lattice, so every observable — ROI, per-frame
    motion samples, BPM trace — must be bit-identical (the monitor-level
    closure of the locate/process_clip parity above)."""
    from respmon_tpu.config import MonitorConfig as MC
    from respmon_tpu.io.capture import ArrayCapture
    from respmon_tpu.runtime import RespiratoryMonitor

    clip_u8, clip_f = clips
    cfg = MC(motion_extraction_method="flow", calibration=CAL)

    def run(frames):
        mon = RespiratoryMonitor(
            capture_target="u8-parity", save_all_data=False, visualize=None,
            motion_extraction_method="flow", config=cfg,
            capture=ArrayCapture(frames, fps=FPS), auto_run=False,
            sync_fps=False)
        mon.run()
        return mon

    m_u8 = run(clip_u8)
    m_f = run(clip_f)
    assert m_u8.ingest_uint8 and not m_f.ingest_uint8
    assert m_u8.calibration_buffer.dtype == np.uint8
    assert (m_u8.x, m_u8.y, m_u8.w, m_u8.h) == (m_f.x, m_f.y, m_f.w, m_f.h)
    assert np.array_equal(np.asarray(m_u8.data), np.asarray(m_f.data),
                          equal_nan=True)
    assert list(m_u8.freq) == list(m_f.freq)
    assert abs(m_u8.freq[-1] - 18.0) <= 1.0
    # Observable host mirrors keep the float [0, 1] convention.
    assert m_u8.cropped_image.dtype == np.float64
    assert float(m_u8.cropped_image.max()) <= 1.0
