"""Decode-time prediction for per-block codec choice (B13).

Role parity with the reference's ``dec_time_prediction.hpp:13-160``:
an 8-feature vector per block (``DS2I_FEATURE_TYPES`` —
dec_time_prediction.hpp:13), a linear predictor per block type
(``predictor::operator()``, :74-105), block statistics computed from the
value multiset (``values_statistics``, :107-140), and the offline
training step (``dec_time_regression.py`` role: fit a linear model of
measured decode wall time on the block features, dropping the
``type``/``time``/``n``/``entropy`` columns exactly as the reference's
``train`` does, dec_time_regression.py:50-52 ``to_drop``).

Differences, by design (Spark-first, no vendored solvers):
* the reference fits with an L1-regularized solver (``l1l1``); we use
  plain least squares (``np.linalg.lstsq``) with a tiny ridge term —
  the predictor surface (weights + bias, same feature names, same
  serialized line format ``type N bias B feat w ...``,
  mixed_block.hpp:load_predictors:224-249) is identical.
* timing is collected in-process over numpy decode kernels rather than
  a C++ microbench; the trained weights live in a TSV the registry
  loads lazily (``predictors_default.tsv``) and a user can retrain with
  ``tools/dec_time_train.py``.

Everything here is plain numpy — it runs inside the Arrow-vectorized
block kernels on executors; nothing touches the driver.
"""

from __future__ import annotations

import numpy as np

# dec_time_prediction.hpp:13 DS2I_FEATURE_TYPES, same order
FEATURES = (
    "n",
    "size",
    "sum_of_logs",
    "entropy",
    "nonzeros",
    "max_b",
    "pfor_b",
    "pfor_exceptions",
)
_FIDX = {f: i for i, f in enumerate(FEATURES)}
NUM_FEATURES = len(FEATURES)

# dec_time_regression.py:50 to_drop = ['type', 'time', 'n', 'entropy']
# (type/time are the label columns; n/entropy are dropped features)
TRAIN_DROP = ("n", "entropy")


def values_statistics(vals: np.ndarray) -> np.ndarray:
    """Block statistics over the value multiset
    (dec_time_prediction.hpp:107-140). Returns the 8-feature vector;
    ``size``/``pfor_b``/``pfor_exceptions`` are left 0 for the caller
    (they depend on the candidate encoding, mixed_block.hpp:83-100).
    """
    f = np.zeros(NUM_FEATURES, dtype=np.float64)
    v = np.asarray(vals, dtype=np.uint64)
    f[_FIDX["n"]] = v.size
    if v.size == 0:
        return f
    u, counts = np.unique(v, return_counts=True)
    n = float(v.size)
    c = counts.astype(np.float64)
    # entropy += group_size * log2(n / group_size)
    f[_FIDX["entropy"]] = float(np.sum(c * np.log2(n / c)))
    # sum_of_logs += group_size * log2(value + 1)
    f[_FIDX["sum_of_logs"]] = float(
        np.sum(c * np.log2(u.astype(np.float64) + 1.0))
    )
    f[_FIDX["nonzeros"]] = float(v.size - (counts[0] if u[0] == 0 else 0))
    f[_FIDX["max_b"]] = float(int(u[-1]).bit_length())
    return f


class Predictor:
    """Linear decode-time model: bias + Σ w_f · feature_f
    (dec_time_prediction.hpp:74-105)."""

    def __init__(self, weights: "dict[str, float] | None" = None, bias: float = 0.0):
        self.w = np.zeros(NUM_FEATURES, dtype=np.float64)
        self.bias = float(bias)
        for k, val in (weights or {}).items():
            self.w[_FIDX[k]] = float(val)

    def __call__(self, fv: np.ndarray) -> float:
        return float(self.bias + self.w @ fv)

    def predict_many(self, fvs: np.ndarray) -> np.ndarray:
        """Vectorized form over an (m, 8) feature matrix."""
        return fvs @ self.w + self.bias

    # ---- serialization: the reference's predictors-file line format
    # ``type N bias B feat w feat w ...`` (mixed_block.hpp:224-249) ----

    def to_line(self, type_id: int) -> str:
        parts = ["type", str(type_id), "bias", repr(self.bias)]
        for i, name in enumerate(FEATURES):
            if self.w[i] != 0.0:
                parts += [name, repr(float(self.w[i]))]
        return "\t".join(parts)

    @classmethod
    def from_line(cls, line: str) -> "tuple[int, Predictor]":
        toks = line.split()
        if len(toks) < 2 or toks[0] != "type":
            raise ValueError("predictor line must start with 'type <id>'")
        type_id = int(toks[1])
        p = cls()
        for k, v in zip(toks[2::2], toks[3::2]):
            if k == "bias":
                p.bias = float(v)
            else:
                p.w[_FIDX[k]] = float(v)
        return type_id, p


def save_predictors(path: str, predictors: "dict[int, Predictor]") -> None:
    with open(path, "w") as f:
        for t in sorted(predictors):
            f.write(predictors[t].to_line(t) + "\n")


def load_predictors(path: str) -> "dict[int, Predictor]":
    out: dict[int, Predictor] = {}
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line:
                continue
            t, p = Predictor.from_line(line)
            out[t] = p
    return out


def fit(
    fvs: np.ndarray, times: np.ndarray, drop: "tuple[str, ...]" = TRAIN_DROP
) -> Predictor:
    """Least-squares fit of decode time on block features
    (dec_time_regression.py:54-57 role; lstsq + tiny ridge instead of
    the L1 solver — see module docstring). ``drop`` columns get weight
    0 exactly as the reference's dropped DataFrame columns do."""
    fvs = np.asarray(fvs, dtype=np.float64)
    times = np.asarray(times, dtype=np.float64)
    keep = [i for i, f in enumerate(FEATURES) if f not in drop]
    X = np.hstack([fvs[:, keep], np.ones((fvs.shape[0], 1))])
    # tiny ridge for rank-deficient feature sets (e.g. pfor_b all-zero
    # for non-pfor types)
    lam = 1e-9
    A = X.T @ X + lam * np.eye(X.shape[1])
    coef = np.linalg.solve(A, X.T @ times)
    p = Predictor(bias=float(coef[-1]))
    for j, i in enumerate(keep):
        p.w[i] = float(coef[j])
    return p
