"""Independent numpy oracle for RWKV-7 (token-by-token, unbatched, fp32).

This deliberately re-derives the forward math from the architecture spec (RWKV-7
"Goose", arXiv:2503.14456; reference behavior Albatross/rwkv7.py:568-679) in a
different style from the JAX model — per-token recurrence, explicit (H, N, N) state —
so the two implementations cross-check each other.
"""

from __future__ import annotations

import numpy as np

HEAD = 64
EXP_NEG_HALF = 0.6065306597126334


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _ln(x, w, b, eps=1e-5):
    mu = x.mean()
    var = ((x - mu) ** 2).mean()
    return (x - mu) / np.sqrt(var + eps) * w + b


def _gn(x, groups, w, b, eps):
    xs = x.reshape(groups, -1)
    mu = xs.mean(-1, keepdims=True)
    var = ((xs - mu) ** 2).mean(-1, keepdims=True)
    return ((xs - mu) / np.sqrt(var + eps)).reshape(-1) * w + b


def dither_np(step):
    u = np.uint32((2654435769 * int(step)) & 0xFFFFFFFF)
    return np.float32(u.view(np.int32)) * np.float32(2.0 ** -41)


class OracleState:
    def __init__(self, L, C):
        H = C // HEAD
        self.att_prev = np.zeros((L, C), np.float32)
        self.ffn_prev = np.zeros((L, C), np.float32)
        self.S = np.zeros((L, H, HEAD, HEAD), np.float32)  # [l, h, i, j]
        self.elapsed = 0


def forward_tokens(params_np, tokens, state: OracleState | None = None,
                   use_dither=True):
    """Feed tokens one at a time; returns (logits_per_token [T, V], state)."""
    p = params_np
    emb = p["emb"]
    blocks = p["blocks"]
    L = blocks["ln1_w"].shape[0]
    C = emb.shape[1]
    H = C // HEAD
    if state is None:
        state = OracleState(L, C)

    out_logits = []
    for tok in tokens:
        x = emb[tok].astype(np.float32).copy()
        v_first = None
        for l in range(L):
            att = {k: v[l] for k, v in blocks["att"].items()}
            ffn = {k: v[l] for k, v in blocks["ffn"].items()}

            xn = _ln(x, blocks["ln1_w"][l], blocks["ln1_b"][l])
            dx = state.att_prev[l] - xn
            state.att_prev[l] = xn
            xr, xw, xk, xv, xa, xg = (xn + dx * att[m] for m in
                                      ("x_r", "x_w", "x_k", "x_v", "x_a", "x_g"))
            r = xr @ att["Wr"]
            w_raw = np.tanh(xw @ att["w1"]) @ att["w2"] + att["w0"]
            k = xk @ att["Wk"]
            v = xv @ att["Wv"]
            a = _sigmoid((xa @ att["a1"]) @ att["a2"] + att["a0"])
            g = _sigmoid(xg @ att["g1"]) @ att["g2"]

            kk = (k * att["k_k"]).reshape(H, HEAD)
            kk = kk / np.maximum(np.linalg.norm(kk, axis=-1, keepdims=True), 1e-12)
            kk = kk.reshape(C)
            k = k * (1 + (a - 1) * att["k_a"])
            kka = kk * a

            if l == 0:
                v_first = v.copy()
            else:
                v = v + (v_first - v) * _sigmoid((xv @ att["v1"]) @ att["v2"] + att["v0"])

            # WKV7: S <- S diag(decay) + v k^T + (S a) b^T ; y = S r
            d = np.exp(-EXP_NEG_HALF * _sigmoid(w_raw)) - 1.0
            if use_dither:
                d = d + dither_np(state.elapsed)
            aa = (-kk).reshape(H, HEAD)
            bb = kka.reshape(H, HEAD)
            kh = k.reshape(H, HEAD)
            vh = v.reshape(H, HEAD)
            rh = r.reshape(H, HEAD)
            dh = d.reshape(H, HEAD)
            y = np.zeros((H, HEAD), np.float32)
            for h in range(H):
                S = state.S[l, h]
                sa = S @ aa[h]
                S += S * dh[h][None, :] + np.outer(vh[h], kh[h]) + np.outer(sa, bb[h])
                y[h] = S @ rh[h]
            y = y.reshape(C)

            y = _gn(y, H, att["ln_x_w"], att["ln_x_b"], eps=64e-5)
            bonus = (r * k * att["r_k"].reshape(C)).reshape(H, HEAD).sum(-1)
            y = y + (bonus[:, None] * v.reshape(H, HEAD)).reshape(C)
            x = x + (y * g) @ att["Wo"]

            xn2 = _ln(x, blocks["ln2_w"][l], blocks["ln2_b"][l])
            dx2 = state.ffn_prev[l] - xn2
            state.ffn_prev[l] = xn2
            kx = xn2 + dx2 * ffn["x_k"]
            hidden = np.square(np.maximum(kx @ ffn["Wk"], 0.0))
            x = x + hidden @ ffn["Wv"]

        state.elapsed += 1
        xh = _ln(x, p["ln_out_w"], p["ln_out_b"])
        out_logits.append(xh @ p["head"])
    return np.stack(out_logits), state
