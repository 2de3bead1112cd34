"""Literal pure-Python port of the reference single-thread GDG.

This is the order/pruning-trace oracle for ``gdg_serial``: an explicit-loop
re-implementation of ``bpgdg_decoder.gdg`` (bp_guessing_decoder.pyx:254-338)
and ``select_vn`` (pyx:340-442), driving a serial port of the BPGD engine
(bpgd.cpp: ``reset`` :199-239, ``peel`` :13-49, ``vn_set_value`` :51-80,
``min_sum_log`` :97-197, ``set_masks`` :241-248, ``get_pm`` :250-256).

Float conventions follow tests/bp_oracle.py: the VN update uses the
posterior identity (outgoing = posterior − own incoming), which is the
convention of the batched kernel under test; the reference's prefix/suffix
sequential sums differ from both only in rounding. The engine runs in
float32 (the device dtype) so history-sum comparisons — whose exact ties
drive the scan-order tie-breaking — agree bit-for-bit with the kernel;
``pre_override`` lets the caller supply the device pre-BP results (their
own bit-exactness is covered by tests/test_bp.py) so the reliability
permutation is shared rather than re-derived in a different precision.

The trace records every queue push (original-column guess VN, anti-value,
depth) in push order, which phase-2 slots were explored vs pruned, and the
evolving (min_pm, min_converge_depth) — the full decision/queue/pm trace
of the serialized work queue.

``scan_interaction`` flags shots where the reference's *sequential*
aggressive-decimation scan observably interacted with itself (an earlier
C/D/A decimation in the same scan deactivated a check read by a later VN's
num_flip count). The batched ``gdg_serial`` evaluates the scan from the
pre-scan state, so trace equality is only promised for shots without such
interaction (low_error_mode disables aggressive decimation entirely and is
always interaction-free).
"""

from __future__ import annotations

import numpy as np

from bp_oracle import bp_oracle

BIG = 1e30


class BPGDOracle:
    """Serial BPGD engine on a dense column-selected sub-PCM."""

    def __init__(self, H, llr_prior, num_iter, factor=1.0,
                 dtype=np.float32):
        self.H = np.asarray(H, dtype=np.int64)
        self.m, self.n = self.H.shape
        self.dtype = dtype
        self.llr_prior = np.asarray(llr_prior, dtype=dtype)
        self.num_iter = int(num_iter)
        self.factor = dtype(factor)
        self.row_cols = [np.nonzero(self.H[i])[0] for i in range(self.m)]
        self.col_rows = [np.nonzero(self.H[:, j])[0] for j in range(self.n)]
        self.vn_degree = self.H.sum(axis=0)

    # --- bpgd.cpp:199-239 -------------------------------------------------
    def reset(self, syndrome):
        syndrome = np.asarray(syndrome).astype(np.int64)
        self.vn_mask = -np.ones(self.n, dtype=np.int64)
        self.cn_mask = syndrome.copy()
        self.cn_degree = self.H.sum(axis=1)
        for cn in range(self.m):
            if self.cn_degree[cn] == 0:
                self.cn_mask[cn] = -1
        self.error = np.zeros(self.n, dtype=np.int64)
        self.syndrome = syndrome.copy()
        self.temp_syndrome = np.zeros(self.m, dtype=np.int64)
        self.history = np.zeros((self.n, 4), dtype=self.dtype)
        if self.peel() == -1:
            return -1
        self.init()
        return 0

    # --- bpgd.cpp:82-95 ---------------------------------------------------
    def init(self):
        self.mv = {}
        self.mc = {}
        zero = self.dtype(0.0)
        for j in range(self.n):
            for i in self.col_rows[j]:
                self.mv[(i, j)] = self.llr_prior[j]
                self.mc[(i, j)] = zero

    # --- bpgd.cpp:51-80 ---------------------------------------------------
    def vn_set_value(self, vn, value):
        if self.vn_mask[vn] != -1:
            return 0 if self.vn_mask[vn] == value else -1
        self.vn_mask[vn] = value
        self.error[vn] = value
        for cn in self.col_rows[vn]:
            if self.cn_mask[cn] == -1 or self.cn_degree[cn] == 0:
                return -1  # reference prints EXCEPTION and exits
            self.cn_degree[cn] -= 1
            if value:
                self.cn_mask[cn] = 1 - self.cn_mask[cn]
            if self.cn_degree[cn] == 0:
                if self.cn_mask[cn] != 0:
                    return -1
                self.cn_mask[cn] = -1
        return 0

    # --- bpgd.cpp:13-49 ---------------------------------------------------
    def peel(self):
        while True:
            degree_check = True
            for cn in range(self.m):
                if self.cn_mask[cn] == -1:
                    continue
                if self.cn_degree[cn] >= 2:
                    continue
                if self.cn_degree[cn] <= 0:
                    self.cn_mask[cn] = -1  # reference's exception branch
                    continue
                degree_check = False
                vn = -1
                for j in self.row_cols[cn]:
                    if self.vn_mask[j] == -1:
                        vn = j
                        break
                if vn == -1:
                    return -1
                if self.vn_set_value(vn, self.cn_mask[cn]) == -1:
                    return -1
            if degree_check:
                return 0

    # --- bpgd.cpp:97-197 --------------------------------------------------
    def min_sum_log(self):
        dt = self.dtype
        for it in range(self.num_iter):
            for cn in range(self.m):
                if self.cn_mask[cn] == -1:
                    continue
                cols = [j for j in self.row_cols[cn] if self.vn_mask[j] == -1]
                clipped = {
                    j: dt(np.clip(self.mv[(cn, j)], dt(-50.0), dt(50.0)))
                    for j in cols
                }
                for j in cols:
                    others = [k for k in cols if k != j]
                    mag = (
                        min(abs(clipped[k]) for k in others)
                        if others else dt(BIG)
                    )
                    sgn = int(self.cn_mask[cn] == 1)
                    for k in others:
                        if clipped[k] <= 0:
                            sgn ^= 1
                    self.mc[(cn, j)] = (
                        self.factor * mag * dt(1 if sgn == 0 else -1)
                    )
            for j in range(self.n):
                if self.vn_mask[j] != -1:
                    continue
                rows = [i for i in self.col_rows[j] if self.cn_mask[i] != -1]
                # f32 accumulation in the kernel's reduce order
                post = self.llr_prior[j]
                for i in rows:
                    post = dt(post + self.mc[(i, j)])
                self.history[j, it % 4] = post
                self.error[j] = 1 if post <= 0 else 0
                for i in rows:
                    self.mv[(i, j)] = dt(post - self.mc[(i, j)])
            self.temp_syndrome = (self.H @ self.error) % 2
            if np.array_equal(self.temp_syndrome, self.syndrome):
                return 1
        return 0

    # --- bpgd.cpp:241-248 -------------------------------------------------
    def set_masks(self, vn_mask, cn_mask, cn_degree):
        self.vn_mask = vn_mask.copy()
        self.error = vn_mask.copy()  # undecided VNs carry -1 until next BP
        self.cn_mask = cn_mask.copy()
        self.cn_degree = cn_degree.copy()
        self.init()

    # --- bpgd.cpp:250-256 -------------------------------------------------
    def get_pm(self):
        pm = self.dtype(0.0)
        for vn in range(self.n):
            if self.error[vn] == 1:
                pm = self.dtype(pm + self.llr_prior[vn])
        return float(pm)


def gdg_serial_oracle(
    H,
    prior,
    syndrome,
    *,
    max_iter=50,
    max_iter_per_step=6,
    max_step=25,
    max_tree_depth=3,
    max_side_depth=10,
    max_side_branch_step=10,
    ms_scaling_factor=1.0,
    gdg_factor=1.0,
    new_n=None,
    low_error_mode=False,
    pre_override=None,  # dict(converged=bool, llr_sum=[n]) from the device
):
    """Run the full serial decode; returns result + decision trace."""
    H = np.asarray(H, dtype=np.int64)
    m, n = H.shape
    prior = np.asarray(prior, dtype=np.float64)
    llr = np.log((1 - prior) / prior)
    syndrome = np.asarray(syndrome).astype(np.int64)
    new_n = min(n, 2 * m) if new_n is None else min(new_n, n)
    max_guess = (2**max_tree_depth - 1) * 2 + max_side_depth - max_tree_depth

    trace = {
        "pre_converged": False,
        "pushes": [],       # (orig_vn, anti_value, alt_depth) in push order
        "explored": [],     # per queue slot: True explored / False pruned
        "pm_events": [],    # (phase, depth, pm) every better-pm convergence
        "min_pm": float(BIG),
        "min_converge_depth": max_step,
        "converged": False,
        "scan_interaction": False,
        "error": np.zeros(n, dtype=np.int64),
    }

    # pre-BP on the full PCM (bp_history_decoder.bp_decode_llr);
    # bp_oracle takes LLR priors directly
    if pre_override is not None:
        pre = dict(pre_override)
    else:
        pre = bp_oracle(H, llr, syndrome, max_iter, alpha=ms_scaling_factor)
    if pre["converged"]:
        trace["pre_converged"] = True
        trace["converged"] = True
        trace["error"] = pre.get("error", np.zeros(n, dtype=np.int64))
        return trace

    # shortening: keep the new_n most-unreliable-first columns (pyx:260-271)
    llr_sum = np.asarray(pre["llr_sum"])
    cols = np.argsort(llr_sum, kind="stable")
    keep = cols[:new_n]
    eng = BPGDOracle(H[:, keep], llr[keep], max_iter_per_step,
                     factor=gdg_factor)
    if eng.reset(syndrome) == -1:
        trace["error"][keep] = eng.error  # partial; reference returns as-is
        return trace

    min_pm = [10000.0]
    min_conv_depth = [max_step]
    bpgd_error = np.zeros(new_n, dtype=np.int64)
    q = []  # snapshots: (vn_mask, cn_mask, cn_degree, guess_vn, value, depth)
    converged = [False]

    def select_vn(side_branch, current_depth):
        """pyx:340-442, sequential scan with mid-scan decimation."""
        A = -3.0 if not side_branch else 0.0
        A_sum = -12.0 if not side_branch else -10.0
        if current_depth == 0:
            A_sum = -16.0
        C, D = 30.0, 3.0
        sum_smallest = 10000.0
        sum_smallest_all_neg = 10000.0
        sum_smallest_vn = -1
        sum_smallest_all_neg_vn = -1
        pre_cn_mask = eng.cn_mask.copy()  # for interaction detection

        for vn in range(new_n):
            if eng.vn_mask[vn] != -1:
                continue
            if eng.vn_degree[vn] <= 2:
                continue
            num_flip = 0
            interacted = False
            for cn in eng.col_rows[vn]:
                if eng.cn_mask[cn] == -1:
                    if pre_cn_mask[cn] != -1:
                        interacted = True
                    continue
                if eng.syndrome[cn] != eng.temp_syndrome[cn]:
                    num_flip += 1
            hist = eng.history[vn]
            history_sum = float(hist.sum())
            all_smaller_than_A = bool((hist <= A).all())
            all_negative = bool((hist <= 0.0).all())
            all_larger_than_C = bool((hist >= C).all())
            all_larger_than_D = bool((hist >= D).all())
            if (not low_error_mode) and all_larger_than_C and current_depth < 4:
                if eng.vn_set_value(vn, 0) == -1:
                    return -1
            elif (not low_error_mode) and num_flip >= 3 and all_larger_than_D:
                if interacted:
                    trace["scan_interaction"] = True
                if eng.vn_set_value(vn, 0) == -1:
                    return -1
            elif (not low_error_mode) and (
                all_smaller_than_A and history_sum < A_sum
            ):
                if eng.vn_set_value(vn, 1) == -1:
                    return -1
            else:
                if interacted:
                    # the batched form would also have counted the cleared
                    # check — only meaningful if it could change the D rule
                    trace["scan_interaction"] = True
                if history_sum < sum_smallest:
                    sum_smallest = history_sum
                    sum_smallest_vn = vn
                if all_negative and history_sum < sum_smallest_all_neg:
                    sum_smallest_all_neg = history_sum
                    sum_smallest_all_neg_vn = vn

        if eng.peel() == -1:
            return -1

        if sum_smallest_all_neg_vn != -1:
            guess_vn, favor = sum_smallest_all_neg_vn, 1
        elif sum_smallest_vn != -1:
            guess_vn = sum_smallest_vn
            favor = 0 if sum_smallest > 0 else 1
        else:
            return -1  # no candidate at all (guess_vn stays -1)
        unfavor = 1 - favor

        guess = True
        if current_depth > min_conv_depth[0]:
            guess = False
        if (not side_branch) and current_depth >= max_side_depth:
            guess = False
        if side_branch and current_depth > max_tree_depth:
            guess = False
        if guess and len(q) < max_guess:
            q.append((
                eng.vn_mask.copy(), eng.cn_mask.copy(), eng.cn_degree.copy(),
                guess_vn, unfavor, current_depth + 1,
            ))
            trace["pushes"].append(
                (int(keep[guess_vn]), int(unfavor), current_depth + 1)
            )

        if eng.vn_set_value(guess_vn, favor) == -1:
            return -1
        if eng.peel() == -1:
            return -1
        return 0

    # ---- phase 1: main branch (pyx:282-296) ------------------------------
    for current_depth in range(max_step):
        if eng.min_sum_log():
            converged[0] = True
            min_conv_depth[0] = current_depth
            min_pm[0] = eng.get_pm()
            bpgd_error[:] = eng.error
            trace["pm_events"].append(("main", current_depth, min_pm[0]))
            break
        if select_vn(False, current_depth) == -1:
            break
    if not converged[0]:
        bpgd_error[:] = eng.error

    # ---- phase 2: queue walk with pruning (pyx:300-335) ------------------
    i = 0
    while i < len(q):
        vn_mask, cn_mask, cn_degree, g_vn, g_val, alt_depth = q[i]
        if alt_depth > min_conv_depth[0]:
            trace["explored"].append(False)
            i += 1
            continue
        trace["explored"].append(True)
        eng.set_masks(vn_mask, cn_mask, cn_degree)
        if eng.vn_set_value(g_vn, g_val) == -1:
            i += 1
            continue
        if eng.peel() == -1:
            i += 1
            continue
        for j in range(max_side_branch_step):
            current_depth = alt_depth + j
            if eng.min_sum_log():
                converged[0] = True
                pm = eng.get_pm()
                if pm < min_pm[0]:
                    if current_depth < min_conv_depth[0]:
                        min_conv_depth[0] = current_depth
                    bpgd_error[:] = eng.error
                    min_pm[0] = pm
                    trace["pm_events"].append(("side", current_depth, pm))
                break
            if current_depth > min_conv_depth[0] + 2:
                break
            if select_vn(True, current_depth) == -1:
                break
        i += 1

    trace["converged"] = converged[0]
    trace["min_pm"] = min_pm[0] if converged[0] else float(BIG)
    trace["min_converge_depth"] = min_conv_depth[0]
    err = np.zeros(n, dtype=np.int64)
    err[keep] = bpgd_error
    trace["error"] = err
    # mark never-reached queue slots (walk ended before them) as pruned
    while len(trace["explored"]) < len(q):
        trace["explored"].append(False)
    return trace
