"""DuckDB-compatible decimal rounding.

numpy rounds half-to-even; DuckDB ``round()`` rounds half away from
zero.  Every float the engine exposes next to a SQL oracle goes through
:func:`round6` so exact .5 boundaries (common for power-of-two ratios
like 105/128) agree with the oracle.
"""

from __future__ import annotations

import numpy as np


def round_away(x, decimals: int = 6):
    arr = np.asarray(x, dtype=np.float64)
    scale = 10.0 ** decimals
    out = np.sign(arr) * np.floor(np.abs(arr) * scale + 0.5) / scale
    return out if out.ndim else float(out)


def round6(x):
    return round_away(x, 6)
