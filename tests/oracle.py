"""Independent NumPy oracle for QINCo2 semantics.

A direct, slow, loop-heavy implementation of the algorithm as specified by
the reference (qinco/model/qinco_base.py, qinco_inference.py), used to
validate the vectorized JAX implementation.  Deliberately written with
per-vector Python loops so it shares no structure with the scan-based
TPU code.
"""

from __future__ import annotations

import numpy as np


def np_step_predict(spec, p, cand, cond):
    """cand (A, D) raw codewords, cond (D,) -> predicted codewords (A, D)."""
    h = cand @ p.in_proj if p.in_proj is not None else cand.copy()
    cc = np.concatenate([h, np.broadcast_to(cond, (len(cand), len(cond)))], axis=-1)
    h = h + (cc @ p.concat_w + p.concat_b)
    for l in range(spec.L):
        h = h + np.maximum(h @ p.ffn_up[l], 0.0) @ p.ffn_down[l]
    out = h @ p.out_proj if p.out_proj is not None else h
    if not spec.qinco1_mode:
        out = out + cand
    return out


def np_decode(spec, params, codes):
    """codes (M_ivf, N) -> xhat (N, D), normalized space."""
    M, N = codes.shape
    steps = [
        type(params.steps)(*[None if l is None else np.asarray(l)[i] for l in params.steps])
        for i in range(M - 1)
    ]
    cb0 = np.asarray(params.codebook0)
    out = np.zeros((N, cb0.shape[1]), np.float32)
    for n in range(N):
        xhat = cb0[codes[0, n]].astype(np.float64)
        for m, p in enumerate(steps):
            cand = np.asarray(p.codebook)[codes[m + 1, n]][None].astype(np.float64)
            xhat = xhat + np_step_predict(spec, p, cand, xhat)[0]
        out[n] = xhat
    return out


def np_encode(spec, params, x):
    """Beam-search encode, per-vector (slow). Returns codes (M_ivf, N)."""
    x = np.asarray(x, np.float64)
    N, D = x.shape
    cb0 = np.asarray(params.codebook0, np.float64)
    M_mlp = spec.n_mlp_steps
    steps = [
        type(params.steps)(
            *[None if l is None else np.asarray(l, np.float64)[i] for l in params.steps]
        )
        for i in range(M_mlp)
    ]

    all_codes = np.zeros((spec.M_ivf, N), np.int32)
    for n in range(N):
        xn = x[n]
        # step 0
        d0 = ((cb0 - xn) ** 2).sum(-1)
        if spec.ivf_in_use:
            order = [int(np.argmin(d0))]
        else:
            order = list(np.argsort(d0, kind="stable")[: spec.beam0])
        beams = [(cb0[c], [int(c)]) for c in order]  # (xhat, code history)

        for i_mlp, p in enumerate(steps):
            F_out = spec.B if i_mlp < M_mlp - 1 else 1
            n_codes = spec.n_codes_at(i_mlp)
            cands = []  # (dist, hist, xhat_new)
            for xhat, hist in beams:
                if spec.has_substep():
                    resid = xn - xhat
                    sd = ((np.asarray(p.sub_codebook) - resid) ** 2).sum(-1)
                    top = np.argsort(sd, kind="stable")[:n_codes]
                else:
                    top = np.arange(spec.K)
                raw = np.asarray(p.codebook)[top]
                pred = np_step_predict(spec, p, raw, xhat)
                abs_cand = pred + xhat
                dist = ((abs_cand - xn) ** 2).sum(-1)
                for j, c in enumerate(top):
                    cands.append((dist[j], hist + [int(c)], abs_cand[j]))
            cands.sort(key=lambda t: t[0])
            beams = [(c[2], c[1]) for c in cands[:F_out]]

        all_codes[:, n] = beams[0][1]
    return all_codes


def np_pairwise_sqdist(a, b):
    return ((a[:, None, :] - b[None, :, :]) ** 2).sum(-1)
