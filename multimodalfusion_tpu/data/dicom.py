"""Native minimal DICOM reader (and test writer) for CT series.

The reference ingests lung CT as DICOM via ``pydicom``
(ref utils/ct_preprocess_utils.py:4,14-34 load_scan;
datasets/dataset_raw.py:51-89).  pydicom is not in this image, so this
module implements the subset of DICOM needed by that pipeline natively:

  * Part-10 files (128-byte preamble + 'DICM') and bare datasets;
  * Explicit VR Little Endian (1.2.840.10008.1.2.1) and
    Implicit VR Little Endian (1.2.840.10008.1.2);
  * defined- and undefined-length sequences are skipped structurally;
  * compressed transfer syntaxes raise a clear error (convert to
    NIfTI via data/nifti.py instead).

``read_file`` returns a ``DicomSlice`` whose attribute surface matches
what the pipeline touches on a pydicom Dataset (``pixel_array``,
``ImagePositionPatient``, ``ImageOrientationPatient``,
``RescaleIntercept``/``RescaleSlope``, ``PixelSpacing``,
``SliceThickness``), so ``ct_preprocess.load_scan`` can use either
backend interchangeably.  ``write_ct_slice`` emits Part-10 explicit-VR
files for tests and interchange.
"""
from __future__ import annotations

import os
import struct
from typing import Dict, List, Optional, Tuple

import numpy as np

EXPLICIT_VR_LE = "1.2.840.10008.1.2.1"
IMPLICIT_VR_LE = "1.2.840.10008.1.2"

# tags the CT pipeline needs (group, element) -> (name, VR)
_TAGS = {
    (0x0008, 0x0060): ("Modality", "CS"),
    (0x0018, 0x0050): ("SliceThickness", "DS"),
    (0x0020, 0x0032): ("ImagePositionPatient", "DS"),
    (0x0020, 0x0037): ("ImageOrientationPatient", "DS"),
    (0x0028, 0x0002): ("SamplesPerPixel", "US"),
    (0x0028, 0x0010): ("Rows", "US"),
    (0x0028, 0x0011): ("Columns", "US"),
    (0x0028, 0x0030): ("PixelSpacing", "DS"),
    (0x0028, 0x0100): ("BitsAllocated", "US"),
    (0x0028, 0x0103): ("PixelRepresentation", "US"),
    (0x0028, 0x1052): ("RescaleIntercept", "DS"),
    (0x0028, 0x1053): ("RescaleSlope", "DS"),
    (0x7FE0, 0x0010): ("PixelData", "OW"),
}

# VRs with a 2-byte reserved field + 4-byte length in explicit VR
_LONG_VRS = {b"OB", b"OW", b"OF", b"OL", b"OD", b"SQ", b"UC", b"UR",
             b"UT", b"UN"}


class DicomSlice:
    """pydicom-Dataset-shaped view over the parsed element dict."""

    def __init__(self, elements: Dict[str, object], path: str = ""):
        self._elements = dict(elements)
        self.path = path
        # pipeline code assigns SliceThickness (ref load_scan :28-33)
        for name, value in elements.items():
            setattr(self, name, value)

    @property
    def pixel_array(self) -> np.ndarray:
        raw = self._elements.get("PixelData")
        if raw is None:
            raise AttributeError("no PixelData")
        rows = int(self._elements["Rows"])
        cols = int(self._elements["Columns"])
        bits = int(self._elements.get("BitsAllocated", 16))
        signed = int(self._elements.get("PixelRepresentation", 0)) == 1
        if bits == 16:
            dtype = np.int16 if signed else np.uint16
        elif bits == 8:
            dtype = np.int8 if signed else np.uint8
        else:
            raise NotImplementedError(f"BitsAllocated={bits}")
        arr = np.frombuffer(raw, dtype=dtype, count=rows * cols)
        return arr.reshape(rows, cols)


def _parse_value(vr: str, raw: bytes):
    if vr == "DS":
        parts = raw.decode("ascii", "ignore").strip("\x00 ").split("\\")
        vals = [float(p) for p in parts if p.strip()]
        return vals if len(vals) != 1 else vals[0]
    if vr == "IS":
        parts = raw.decode("ascii", "ignore").strip("\x00 ").split("\\")
        vals = [int(p) for p in parts if p.strip()]
        return vals if len(vals) != 1 else vals[0]
    if vr == "US":
        return struct.unpack("<H", raw[:2])[0]
    if vr == "CS":
        return raw.decode("ascii", "ignore").strip("\x00 ")
    return raw


def _elem_header(buf: bytes, pos: int, explicit: bool):
    """Parse one data-element header -> (group, elem, vr, length, vpos).
    Item/delimiter tags (group FFFE) always use the implicit 4-byte
    length layout regardless of the dataset's transfer syntax."""
    group, elem = struct.unpack("<HH", buf[pos:pos + 4])
    if group == 0xFFFE or not explicit:
        length = struct.unpack("<I", buf[pos + 4:pos + 8])[0]
        vr_s = _TAGS.get((group, elem), ("", "UN"))[1]
        return group, elem, vr_s, length, pos + 8
    vr = buf[pos + 4:pos + 6]
    if vr in _LONG_VRS:
        length = struct.unpack("<I", buf[pos + 8:pos + 12])[0]
        return group, elem, vr.decode("ascii", "ignore"), length, pos + 12
    length = struct.unpack("<H", buf[pos + 6:pos + 8])[0]
    return group, elem, vr.decode("ascii", "ignore"), length, pos + 8


def _skip_sequence(buf: bytes, pos: int, explicit: bool) -> int:
    """Skip an undefined-length sequence VALUE: a stream of items
    (FFFE,E000) ending at the sequence delimiter (FFFE,E0DD).
    Defined-length items skip by length; undefined-length items contain
    ordinary data elements (parsed with ``_elem_header``, recursing for
    nested undefined-length sequences) until their item delimiter
    (FFFE,E00D)."""
    n = len(buf)
    while pos + 8 <= n:
        group, elem, _, length, vpos = _elem_header(buf, pos, explicit)
        if (group, elem) == (0xFFFE, 0xE0DD):      # sequence delimiter
            return vpos
        if (group, elem) != (0xFFFE, 0xE000):
            raise ValueError(
                f"expected an item tag inside a sequence, got "
                f"({group:04x},{elem:04x})")
        if length != 0xFFFFFFFF:
            pos = vpos + length                     # defined-length item
            continue
        # undefined-length item: walk its dataset elements
        pos = vpos
        while pos + 8 <= n:
            g2, e2, _, l2, v2 = _elem_header(buf, pos, explicit)
            if (g2, e2) == (0xFFFE, 0xE00D):        # item delimiter
                pos = v2
                break
            pos = _skip_sequence(buf, v2, explicit) \
                if l2 == 0xFFFFFFFF else v2 + l2
    return pos


def _walk(buf: bytes, pos: int, explicit: bool, stop_group=None):
    """Yield (group, elem, vr, raw_value, next_pos) element stream."""
    n = len(buf)
    while pos + 8 <= n:
        group = struct.unpack("<H", buf[pos:pos + 2])[0]
        if stop_group is not None and group != stop_group:
            return
        group, elem, vr_s, length, vpos = _elem_header(buf, pos, explicit)
        if length == 0xFFFFFFFF:
            if vr_s not in ("SQ", "UN", "OW", "OB"):
                raise ValueError(
                    f"undefined length on VR {vr_s} at tag "
                    f"({group:04x},{elem:04x})")
            end = _skip_sequence(buf, vpos, explicit)
            yield group, elem, vr_s, None, end
            pos = end
            continue
        yield group, elem, vr_s, buf[vpos:vpos + length], vpos + length
        pos = vpos + length


def read_file(path: str) -> DicomSlice:
    """Parse one DICOM file into a DicomSlice."""
    with open(path, "rb") as f:
        buf = f.read()
    pos = 0
    transfer_syntax = EXPLICIT_VR_LE
    if len(buf) > 132 and buf[128:132] == b"DICM":
        pos = 132
        # file meta group (0002) is ALWAYS explicit VR LE
        meta_end = pos
        for group, elem, vr, raw, nxt in _walk(buf, pos, True,
                                               stop_group=0x0002):
            meta_end = nxt
            if (group, elem) == (0x0002, 0x0010):
                transfer_syntax = raw.decode("ascii",
                                             "ignore").strip("\x00 ")
        pos = meta_end
    if transfer_syntax not in (EXPLICIT_VR_LE, IMPLICIT_VR_LE):
        raise NotImplementedError(
            f"transfer syntax {transfer_syntax} (compressed or big-"
            f"endian) is not supported by the native reader — convert "
            f"the series to NIfTI (data/nifti.py)")
    explicit = transfer_syntax == EXPLICIT_VR_LE

    elements: Dict[str, object] = {}
    for group, elem, vr, raw, _ in _walk(buf, pos, explicit):
        name_vr = _TAGS.get((group, elem))
        if name_vr is None or raw is None:
            continue
        name, default_vr = name_vr
        use_vr = vr if (explicit and vr not in ("UN", "")) else default_vr
        if name == "PixelData":
            elements[name] = raw
        else:
            elements[name] = _parse_value(use_vr, raw)
    return DicomSlice(elements, path)


def read_series(path: str) -> List[DicomSlice]:
    """Read every .dcm file in a directory, sorted by the z component of
    ImagePositionPatient (ref load_scan :14-27)."""
    names = sorted(n for n in os.listdir(path) if ".dcm" in n.lower())
    slices = [read_file(os.path.join(path, n)) for n in names]
    slices.sort(key=lambda s: float(s.ImagePositionPatient[2]))
    return slices


# ---------------------------------------------------------------------------
# minimal writer (tests / interchange)
# ---------------------------------------------------------------------------

def _enc_element(group: int, elem: int, vr: str, value: bytes) -> bytes:
    # PS3.5 padding: text VRs pad with space, UI (and binary) with NUL
    if len(value) % 2:
        value += b" " if vr in ("DS", "IS", "CS") else b"\x00"
    head = struct.pack("<HH", group, elem)
    if vr.encode() in _LONG_VRS:
        return head + vr.encode() + b"\x00\x00" + struct.pack(
            "<I", len(value)) + value
    return head + vr.encode() + struct.pack("<H", len(value)) + value


def _ds(*vals) -> bytes:
    return "\\".join(f"{v:g}" for v in vals).encode()


def write_ct_slice(path: str, pixels: np.ndarray, z: float,
                   spacing: Tuple[float, float] = (1.0, 1.0),
                   thickness: float = 1.0, intercept: float = -1024.0,
                   slope: float = 1.0,
                   orientation=(1, 0, 0, 0, 1, 0),
                   implicit: bool = False) -> str:
    """Write a single-frame 16-bit CT slice as a Part-10 DICOM file."""
    pixels = np.ascontiguousarray(pixels, np.int16)
    rows, cols = pixels.shape

    body = b""
    if implicit:
        def enc(group, elem, vr, value):
            if len(value) % 2:
                value += b" " if vr in ("DS", "IS", "CS") else b"\x00"
            return struct.pack("<HHI", group, elem, len(value)) + value
    else:
        enc = _enc_element
    body += enc(0x0008, 0x0060, "CS", b"CT")
    body += enc(0x0018, 0x0050, "DS", _ds(thickness))
    body += enc(0x0020, 0x0032, "DS", _ds(0.0, 0.0, z))
    body += enc(0x0020, 0x0037, "DS", _ds(*orientation))
    body += enc(0x0028, 0x0002, "US", struct.pack("<H", 1))
    body += enc(0x0028, 0x0010, "US", struct.pack("<H", rows))
    body += enc(0x0028, 0x0011, "US", struct.pack("<H", cols))
    body += enc(0x0028, 0x0030, "DS", _ds(*spacing))
    body += enc(0x0028, 0x0100, "US", struct.pack("<H", 16))
    body += enc(0x0028, 0x0103, "US", struct.pack("<H", 1))
    body += enc(0x0028, 0x1052, "DS", _ds(intercept))
    body += enc(0x0028, 0x1053, "DS", _ds(slope))
    body += enc(0x7FE0, 0x0010, "OW", pixels.tobytes())

    ts = (IMPLICIT_VR_LE if implicit else EXPLICIT_VR_LE).encode()
    meta = _enc_element(0x0002, 0x0010, "UI", ts)
    with open(path, "wb") as f:
        f.write(b"\x00" * 128 + b"DICM" + meta + body)
    return path
