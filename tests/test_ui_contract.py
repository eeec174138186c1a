"""UI backend contract (reference base.py:174-225 PyqtgraphUI parity).

Qt is not installed in CI, so ``PyqtgraphUI`` cannot be constructed here —
instead this locks the API contract: both backends must expose exactly the
same public methods with identical signatures, so a drift in the Qt backend
(which only runs in deployment) surfaces as a CI failure, and the monitor's
calls against ``HeadlessUI`` exercise the shared surface.
"""

import inspect

import numpy as np
import pytest

from respmon_tpu.viz.ui import HeadlessUI, PyqtgraphUI, make_ui


def _public_methods(cls):
    return {n: m for n, m in vars(cls).items()
            if callable(m) and not n.startswith("_")}


def test_backends_expose_identical_method_signatures():
    head = _public_methods(HeadlessUI)
    qt = _public_methods(PyqtgraphUI)
    assert set(head) == set(qt), (
        f"backend method sets diverge: only-headless="
        f"{set(head) - set(qt)}, only-qt={set(qt) - set(head)}")
    for name in head:
        sh = inspect.signature(head[name])
        sq = inspect.signature(qt[name])
        assert sh == sq, f"{name}: {sh} != {sq}"


def test_constructor_signatures_compatible():
    # The factory calls PyqtgraphUI(fig_size); HeadlessUI takes no args.
    sig = inspect.signature(PyqtgraphUI.__init__)
    params = [p for p in sig.parameters.values() if p.name != "self"]
    assert params and params[0].name == "fig_size"
    assert params[0].default is None


def test_make_ui_falls_back_headless():
    # No Qt in this environment: the factory must fall back, not raise.
    ui = make_ui("pyqtgraph")
    assert isinstance(ui, HeadlessUI)
    assert isinstance(make_ui(None), HeadlessUI)


def test_headless_ui_full_surface_smoke():
    # Drive every public method the monitor uses, end to end.
    ui = make_ui(None)
    t = np.linspace(0.0, 12.8, 128)
    y = np.sin(t)
    ui.set_window_title("Respiration Monitor")
    ui.set_image(np.zeros((48, 64), np.uint8))
    ui.set_plot_autoscale(True)
    ui.set_plot_autoscale(False, axes="x")
    ui.set_plot_x_range(0.0, 12.8)
    ui.set_raw_signal(t, y)
    ui.set_peaks(t[::16], y[::16])
    ui.set_frequency(t[13:], np.full(115, 18.0))
    ui.set_keypoints(np.zeros((3, 1, 2), np.float32))
    ui.set_bpm_text("18.0 BPM")
    ui.process_events()
    ui.clear_plots()
    ui.close()


def test_pyqtgraph_ui_constructs_offscreen(monkeypatch):
    # Deployment check (skipped where pyqtgraph is absent, as in CI): the
    # Qt backend must construct on the installed pyqtgraph/Qt version —
    # it uses pg.mkQApp(), which survives the Qt5->Qt6 QApplication move.
    pytest.importorskip("pyqtgraph")
    monkeypatch.setenv("QT_QPA_PLATFORM", "offscreen")
    ui = PyqtgraphUI()
    ui.set_window_title("t")
    ui.set_image(np.zeros((8, 8), np.uint8))
    ui.set_raw_signal([0.0, 1.0], [0.0, 1.0])
    ui.set_keypoints(None)
    ui.set_bpm_text("18.0 BPM")
    ui.process_events()
    ui.clear_plots()
    ui.close()


def test_overlay_keypoints_matches_reference_drawing():
    # Literal reference semantics (base.py:272-277): cumulative radius-2
    # circle mask, saturating-added to the crop each iteration.
    cv2 = pytest.importorskip("cv2")
    from respmon_tpu.viz.ui import overlay_keypoints

    rng = np.random.default_rng(7)
    base = rng.integers(0, 200, (40, 56), dtype=np.uint8)
    pts = np.asarray([[[5.2, 7.8]], [[30.0, 20.0]], [[54.9, 38.6]]],
                     np.float32)
    got = overlay_keypoints(base, pts)
    mask = np.zeros_like(base)
    disp = base.copy()
    for new in pts:
        a, b = new.ravel()
        mask = cv2.circle(mask, (int(round(float(a))),
                                 int(round(float(b)))), 2,
                          (255, 255, 255), -1)
        disp = cv2.add(disp, mask)
    np.testing.assert_array_equal(got, disp)
    # No points: frame returned untouched.
    np.testing.assert_array_equal(overlay_keypoints(base, None), base)
    np.testing.assert_array_equal(
        overlay_keypoints(base, np.zeros((0, 1, 2), np.float32)), base)


def test_every_qt_method_is_smoke_covered():
    # The smoke test above must touch every method of the shared contract;
    # if a new method is added to the backends, this forces coverage.
    import ast
    import textwrap

    src = ast.parse(textwrap.dedent(inspect.getsource(
        test_headless_ui_full_surface_smoke)))
    called = {node.func.attr for node in ast.walk(src)
              if isinstance(node, ast.Call)
              and isinstance(node.func, ast.Attribute)
              and isinstance(node.func.value, ast.Name)
              and node.func.value.id == "ui"}
    assert set(_public_methods(HeadlessUI)) <= called
