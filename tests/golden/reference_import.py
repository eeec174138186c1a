"""Import the ACTUAL reference modules as parity oracles.

``/root/reference/transforms.py`` and ``pyramid.py`` depend only on
cv2/scipy/numpy/matplotlib at call time, but ``transforms`` also imports
``pywt`` and ``prototypes.wavelets`` at module level (used only by the
wavelet helpers, which these tests never call) — so a minimal ``pywt`` stub
is installed before import.  ``base.py`` is NOT importable here (it needs
peakutils/pyqtgraph/tqdm); its ``locate`` body (base.py:547-601) is
reconstructed in the tests from the imported transforms functions + direct
cv2 calls, with line citations.

Test-only code: nothing here ships in respmon_tpu.
"""

from __future__ import annotations

import sys
import types

_REF = "/root/reference"
_cache = None


def _install_pywt_stub() -> None:
    if "pywt" in sys.modules:
        return

    def _unavailable(*a, **k):  # pragma: no cover
        raise RuntimeError("pywt stub: wavelet oracle unavailable "
                           "(pywt is not installed in this environment)")

    stub = types.ModuleType("pywt")
    stub.Wavelet = _unavailable
    stub.dwt = _unavailable
    stub.waverec = _unavailable
    stub.Modes = types.SimpleNamespace(smooth=None)
    data = types.ModuleType("pywt.data")
    # prototypes/wavelets.py calls pywt.data.ecg() at import time.
    import numpy as _np

    data.ecg = lambda: _np.zeros(1024)
    stub.data = data
    sys.modules["pywt"] = stub
    sys.modules["pywt.data"] = data


def load_reference():
    """Return (pyramid, transforms) — the real reference modules."""
    global _cache
    if _cache is not None:
        return _cache
    import matplotlib

    matplotlib.use("Agg")
    _install_pywt_stub()
    if _REF not in sys.path:
        sys.path.insert(0, _REF)
    import pyramid as ref_pyramid  # noqa: the reference's top-level module
    import transforms as ref_transforms

    _cache = (ref_pyramid, ref_transforms)
    return _cache
