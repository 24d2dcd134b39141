"""HRD conformance checker: simulate the CPB of spec Annex C against an
Annex-B stream's own BP/PT SEI timing.

Reference behavior being validated: x264's hrd_fullness
(encoder/ratecontrol.c:2194) + SEI timing writes (encoder/set.c:654,687).
This tool is the missing independent check: it re-derives removal times
from the stream's buffering-period / pic-timing SEIs and the VUI HRD
parameters, plays frame arrivals at the signaled rate, and reports CPB
underflow/overflow.

Usage: python tools/hrd_check.py stream.264
Library: check_hrd(data: bytes) -> dict
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from x264_tpu.entropy.nal import split_annexb, unescape_rbsp


class _BR:
    def __init__(self, data: bytes) -> None:
        self.d = data
        self.pos = 0

    def u1(self) -> int:
        byte = self.d[self.pos >> 3]
        bit = (byte >> (7 - (self.pos & 7))) & 1
        self.pos += 1
        return bit

    def u(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.u1()
        return v

    def ue(self) -> int:
        zeros = 0
        while self.u1() == 0:
            zeros += 1
            if zeros > 32:
                raise ValueError("bad ue")
        return (1 << zeros) - 1 + (self.u(zeros) if zeros else 0)

    def se(self) -> int:
        k = self.ue()
        return (k + 1) // 2 if k & 1 else -(k // 2)


def _parse_sps_hrd(rbsp: bytes) -> dict | None:
    """Minimal SPS parse down to the VUI NAL-HRD parameters."""
    r = _BR(rbsp)
    profile = r.u(8)
    r.u(8)
    r.u(8)
    r.ue()
    if profile in (100, 110, 122, 244, 44, 83, 86, 118, 128):
        cfi = r.ue()
        if cfi == 3:
            r.u1()
        r.ue()
        r.ue()
        r.u1()
        if r.u1():
            raise NotImplementedError("scaling lists")
    r.ue()                      # log2_max_frame_num
    poc = r.ue()
    if poc == 0:
        r.ue()
    elif poc == 1:
        raise NotImplementedError("poc type 1")
    r.ue()                      # num_ref_frames
    r.u1()
    r.ue()                      # mb_w
    r.ue()                      # mb_h
    if not r.u1():              # frame_mbs_only
        r.u1()
    r.u1()                      # direct8x8
    if r.u1():                  # crop
        r.ue(); r.ue(); r.ue(); r.ue()
    if not r.u1():              # vui_parameters_present
        return None
    # ---- VUI (spec E.1.1) ----
    if r.u1():                  # aspect_ratio_info
        if r.u(8) == 255:
            r.u(16); r.u(16)
    if r.u1():                  # overscan
        r.u1()
    if r.u1():                  # video_signal_type
        r.u(3); r.u1()
        if r.u1():
            r.u(8); r.u(8); r.u(8)
    if r.u1():                  # chroma_loc
        r.ue(); r.ue()
    out = {"num_units_in_tick": 0, "time_scale": 0}
    if r.u1():                  # timing_info
        out["num_units_in_tick"] = r.u(32)
        out["time_scale"] = r.u(32)
        r.u1()
    if not r.u1():              # nal_hrd_parameters_present
        return None
    cpb_cnt = r.ue() + 1
    br_scale = r.u(4)
    cpb_scale = r.u(4)
    rates, sizes, cbrs = [], [], []
    for _ in range(cpb_cnt):
        rates.append((r.ue() + 1) << (6 + br_scale))
        sizes.append((r.ue() + 1) << (4 + cpb_scale))
        cbrs.append(r.u1())
    out["bitrate"] = rates[0]
    out["cpb_size"] = sizes[0]
    out["cbr"] = bool(cbrs[0])
    out["init_len"] = r.u(5) + 1
    out["cpb_len"] = r.u(5) + 1
    out["dpb_len"] = r.u(5) + 1
    r.u(5)                      # time_offset_length
    if r.u1():                  # vcl_hrd
        raise NotImplementedError("vcl hrd")
    if out is not None:
        r.u1()                  # low_delay_hrd
    out["pic_struct"] = r.u1()
    return out


def _parse_seis(rbsp: bytes) -> list[tuple[int, bytes]]:
    """Split an SEI NAL's rbsp into (payload_type, payload) messages."""
    out = []
    i = 0
    while i < len(rbsp) and rbsp[i] != 0x80:
        ptype = 0
        while rbsp[i] == 0xFF:
            ptype += 255
            i += 1
        ptype += rbsp[i]
        i += 1
        size = 0
        while rbsp[i] == 0xFF:
            size += 255
            i += 1
        size += rbsp[i]
        i += 1
        out.append((ptype, rbsp[i:i + size]))
        i += size
    return out


def check_hrd(data: bytes, verbose: bool = False) -> dict:
    """Simulate the type-II (NAL) HRD CPB. Returns a report dict with
    ok / underflows / overflows / min_slack_bits."""
    hrd = None
    aus = []        # list of dicts: bits, bp(initial_delay), cpb_delay
    cur = {"bits": 0, "bp": None, "cpb_delay": None}
    seen_vcl = False
    for nal in split_annexb(data):
        ntype = nal[0] & 0x1F
        nbits = (len(nal) + 4) * 8          # incl. 4-byte startcode
        if ntype in (1, 5) and seen_vcl is False:
            seen_vcl = True
        if ntype in (7,):
            if hrd is None:
                hrd = _parse_sps_hrd(unescape_rbsp(nal[1:]))
        if seen_vcl and ntype not in (1, 5, 12):
            # next AU begins at the first non-slice after slices
            aus.append(cur)
            cur = {"bits": 0, "bp": None, "cpb_delay": None}
            seen_vcl = False
        cur["bits"] += nbits
        if ntype == 6 and hrd is not None:
            for ptype, pl in _parse_seis(unescape_rbsp(nal[1:])):
                r = _BR(pl)
                if ptype == 0:              # buffering period
                    r.ue()
                    cur["bp"] = (r.u(hrd["init_len"]),
                                 r.u(hrd["init_len"]))
                elif ptype == 1:            # pic timing
                    cur["cpb_delay"] = r.u(hrd["cpb_len"])
                    cur["dpb_delay"] = r.u(hrd["dpb_len"])
    if cur["bits"]:
        aus.append(cur)
    if hrd is None:
        return {"ok": None, "reason": "no NAL HRD parameters"}
    if not aus or aus[0]["bp"] is None:
        return {"ok": False, "reason": "no buffering period SEI at start"}

    rate = hrd["bitrate"]
    cpb = hrd["cpb_size"]
    tc = hrd["num_units_in_tick"] / max(hrd["time_scale"], 1)
    t_af = 0.0                  # final arrival of previous AU
    t_r_bp = 0.0                # removal time of last BP AU
    bp_delay, bp_offset = aus[0]["bp"]
    underflows = overflows = 0
    min_slack = float("inf")
    removed = 0.0
    arrived_origin = None       # arrival-clock origin for CBR fill calc
    for i, au in enumerate(aus):
        is_bp = au["bp"] is not None
        if is_bp:
            bp_delay, bp_offset = au["bp"]
        if i == 0:
            t_r = bp_delay / 90000.0
        else:
            t_r = t_r_bp + tc * (au["cpb_delay"] or 0)
        if is_bp:
            t_r_bp = t_r
        # arrival (spec C.1.1): CBR streams continuously; VBR may wait
        # until the earliest arrival time derived from the BP delays
        if hrd["cbr"] or i == 0:
            t_ai = t_af
        else:
            lim = bp_delay + (0 if is_bp else bp_offset)
            t_ai = max(t_af, t_r - lim / 90000.0)
        if arrived_origin is None:
            arrived_origin = t_ai
        t_af = t_ai + au["bits"] / rate
        slack = (t_r - t_af) * rate
        min_slack = min(min_slack, slack)
        if t_af > t_r + 1e-9:
            underflows += 1
            if verbose:
                print(f"AU {i}: UNDERFLOW arrival {t_af*1000:.2f}ms > "
                      f"removal {t_r*1000:.2f}ms")
        if hrd["cbr"]:
            # CBR: the channel delivers continuously at `rate`, so the
            # fill just before removal is rate*elapsed minus removals;
            # exceeding the CPB means the encoder failed to pad with
            # filler (reference hrd_filler) or genuinely overflowed
            fill = (t_r - arrived_origin) * rate - removed
            if fill > cpb + 1e-6 * cpb:
                overflows += 1
                if verbose:
                    print(f"AU {i}: OVERFLOW fill {fill:.0f} > {cpb}")
        removed += au["bits"]
    return {"ok": underflows == 0 and overflows == 0,
            "n_au": len(aus), "underflows": underflows,
            "overflows": overflows, "min_slack_bits": min_slack,
            "bitrate": rate, "cpb_size": cpb, "cbr": hrd["cbr"]}


if __name__ == "__main__":
    with open(sys.argv[1], "rb") as f:
        rep = check_hrd(f.read(), verbose=True)
    print(rep)
    sys.exit(0 if rep.get("ok") else 1)
