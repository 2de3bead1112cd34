"""Serial min-sum BP oracle (float64, explicit loops).

A direct, obviously-correct implementation of the reference message
schedule (osd_window.pyx:381-485 / bpgd.cpp:97-197) used to validate the
batched TPU kernel: per check, each outgoing magnitude is the exact min of
the *other* incoming |messages| (clipped), the sign is the check parity
XOR the other incoming signs with zero counted negative, scaled by alpha;
per variable, posterior = prior + sum incoming, outgoing = posterior - own.
History ring of 4, hard decision <= 0, convergence on full-PCM syndrome.
"""

import numpy as np


def bp_oracle(
    H,
    prior_llr,
    syndrome,
    num_iter,
    alpha=1.0,
    clip=50.0,
    vn_state=None,
    cn_state=None,
):
    H = np.asarray(H)
    m, n = H.shape
    prior_llr = np.asarray(prior_llr, dtype=np.float64)
    syndrome = np.asarray(syndrome).astype(np.int64)
    if vn_state is None:
        vn_state = -np.ones(n, dtype=np.int64)
    if cn_state is None:
        cn_state = syndrome.copy()
    vn_state = np.asarray(vn_state).astype(np.int64)
    cn_state = np.asarray(cn_state).astype(np.int64)

    row_cols = [np.nonzero(H[i])[0] for i in range(m)]
    col_rows = [np.nonzero(H[:, j])[0] for j in range(n)]

    # messages keyed by (check, var)
    mv = {}  # var -> check
    mc = {}  # check -> var
    for j in range(n):
        for i in col_rows[j]:
            mv[(i, j)] = prior_llr[j]
            mc[(i, j)] = 0.0

    history = np.zeros((n, 4))
    error = np.zeros(n, dtype=np.int64)
    error[vn_state >= 0] = vn_state[vn_state >= 0]
    converged = False
    iters = 0

    for it in range(num_iter):
        iters += 1
        for i in range(m):
            if cn_state[i] == -1:
                continue
            cols = [j for j in row_cols[i] if vn_state[j] == -1]
            clipped = {j: np.clip(mv[(i, j)], -clip, clip) for j in cols}
            for j in cols:
                others = [k for k in cols if k != j]
                if others:
                    mag = min(abs(clipped[k]) for k in others)
                else:
                    mag = 1e30
                sgn = int(cn_state[i] == 1)
                for k in others:
                    if clipped[k] <= 0:
                        sgn ^= 1
                mc[(i, j)] = alpha * mag * (1 if sgn == 0 else -1)
        for j in range(n):
            if vn_state[j] != -1:
                continue
            rows = [i for i in col_rows[j] if cn_state[i] != -1]
            post = prior_llr[j] + sum(mc[(i, j)] for i in rows)
            history[j, it % 4] = post
            error[j] = 1 if post <= 0 else 0
            for i in rows:
                mv[(i, j)] = post - mc[(i, j)]
        synd_hat = (H @ error) % 2
        if np.array_equal(synd_hat, syndrome):
            converged = True
            break

    return {
        "error": error,
        "converged": converged,
        "iterations": iters,
        "history": history,
        "llr_sum": history.sum(axis=1),
    }
