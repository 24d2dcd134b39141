"""Output muxers (reference: output/output.h vtable; output/raw.c).

Raw Annex-B elementary stream for now; mkv/mp4/flv are later milestones.
"""

from __future__ import annotations

from ..entropy.nal import NAL, annexb_bytes


class RawOutput:
    """Raw .264 / .h264 Annex-B writer (reference: output/raw.c)."""

    def __init__(self, path) -> None:
        if hasattr(path, "write"):
            self._f = path
            self._own = False
        else:
            self._f = open(path, "wb")
            self._own = True
        self.bytes_written = 0

    def set_param(self, params) -> None:
        pass

    def write_headers(self, nals: list[NAL]) -> int:
        return self.write_frame(nals)

    def write_frame(self, nals: list[NAL]) -> int:
        data = annexb_bytes(nals)
        self._f.write(data)
        self.bytes_written += len(data)
        return len(data)

    def close(self, largest_pts=None, second_largest_pts=None) -> None:
        if self._own:
            self._f.close()


def open_output(path: str):
    return RawOutput(path)
