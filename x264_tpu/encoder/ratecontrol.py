"""Rate control: CQP / CRF / ABR (reference encoder/ratecontrol.c, 3134 LoC;
doc/ratecontrol.txt).

Round-1 scope: frame-level control with the reference's qscale model —
qscale = blurred_complexity^(1-qcompress) / rate_factor — driven by the
device-computed frame SATD cost, with ABR buffer feedback. Per-MB adaptive
quantization, VBV and 2-pass land next. Under the frame pipeline the state
updates lag one frame, exactly like the reference's frame-thread RC sync
(x264_thread_sync_ratecontrol, ratecontrol.c:2754).
"""

from __future__ import annotations

import math

from .. import params as P
from .encoder import TYPE_B, TYPE_BREF, TYPE_I, TYPE_IDR, TYPE_P


def qp2qscale(qp: float) -> float:
    return 0.85 * 2.0 ** ((qp - 12.0) / 6.0)


def qscale2qp(qscale: float) -> float:
    return 12.0 + 6.0 * math.log2(qscale / 0.85)


class RateControl:
    """Frame-level rate control state (reference x264_ratecontrol_t)."""

    def __init__(self, p: P.Params) -> None:
        self.p = p
        self.method = p.rc.rc_method
        self.qcomp = p.rc.qcompress
        self.fps = p.fps_num / max(1, p.fps_den)
        self.bitrate = p.rc.bitrate * 1000.0
        # complexity blur state (reference rate_estimate_qscale)
        self.cplx_sum = 0.0
        self.cplx_count = 0.0
        self.total_bits = 0.0
        self.frames = 0
        self.last_rceq = 1.0
        # per-MB full-res SATD calibration constant (reference uses
        # mb_count*(80|120) against half-res lowres costs; our frame cost
        # is full-res, ~4x)
        self.base_cplx = p.mb_width * p.mb_height * (
            480 if p.bframe else 320)
        if self.method == P.RC_CRF:
            self.rate_factor = (self.base_cplx ** (1.0 - self.qcomp)
                                / qp2qscale(p.rc.rf_constant))
        else:
            self.rate_factor = 1.0
        # ABR state (reference ratecontrol_new ABR init)
        self.cplxr_sum = (0.01 * (7.0e5 ** self.qcomp)
                          * (p.mb_width * p.mb_height) ** 0.5)
        self.wanted_bits_window = max(self.bitrate / max(self.fps, 1.0),
                                      1.0)
        self.cbr_decay = 1.0

    # ------------------------------------------------------------- frame
    def start(self, ftype: int, forced_qp: int = -1) -> int:
        """QP for the upcoming frame (reference x264_ratecontrol_start)."""
        rc = self.p.rc
        if forced_qp >= 0:
            return forced_qp
        if self.method == P.RC_CQP:
            q = rc.qp_constant
            if ftype in (TYPE_IDR, TYPE_I):
                q = int(round(q - 6.0 * math.log2(rc.ip_factor)))
            elif ftype in (TYPE_B, TYPE_BREF):
                q = int(round(q + 6.0 * math.log2(rc.pb_factor)))
            return int(min(max(q, rc.qp_min), rc.qp_max))

        blurred = (self.cplx_sum / self.cplx_count
                   if self.cplx_count > 0 else float(self.base_cplx))
        self.last_rceq = blurred ** (1.0 - self.qcomp)
        if self.method == P.RC_ABR:
            rate_factor = self.wanted_bits_window / self.cplxr_sum
        else:
            rate_factor = self.rate_factor
        qscale = self.last_rceq / max(rate_factor, 1e-9)

        if self.method == P.RC_ABR and self.frames > 0:
            # overflow compensation (reference rate_estimate_qscale ABR)
            wanted = self.bitrate / self.fps * self.frames
            abr_buffer = 2.0 * rc.rate_tolerance * self.bitrate
            overflow = min(max(
                1.0 + (self.total_bits - wanted) / max(abr_buffer, 1.0),
                0.5), 2.0)
            qscale *= overflow

        if ftype in (TYPE_IDR, TYPE_I):
            qscale /= rc.ip_factor
        elif ftype in (TYPE_B, TYPE_BREF):
            qscale *= rc.pb_factor

        qp = qscale2qp(max(qscale, 1e-4))
        qp = min(max(qp, rc.qp_min), rc.qp_max)
        self._pending_qscale = qp2qscale(qp)
        return int(round(qp))

    def end(self, ftype: int, bits: int, satd_cost: float,
            qp_used: int) -> None:
        """Post-frame update (reference x264_ratecontrol_end)."""
        if self.method == P.RC_CQP:
            return
        satd = max(float(satd_cost), 1.0)
        self.cplx_sum = self.cplx_sum * 0.5 + satd
        self.cplx_count = self.cplx_count * 0.5 + 1.0
        self.total_bits += bits
        self.frames += 1
        if self.method == P.RC_ABR:
            # undo the I/B qscale offsets so the model tracks P-equivalents
            qscale = qp2qscale(qp_used)
            if ftype in (TYPE_IDR, TYPE_I):
                qscale *= self.p.rc.ip_factor
            elif ftype in (TYPE_B, TYPE_BREF):
                qscale /= self.p.rc.pb_factor
            self.cplxr_sum = (self.cplxr_sum * self.cbr_decay
                              + bits * qscale / max(self.last_rceq, 1e-9))
            self.wanted_bits_window = (
                self.wanted_bits_window * self.cbr_decay
                + self.bitrate / self.fps)
