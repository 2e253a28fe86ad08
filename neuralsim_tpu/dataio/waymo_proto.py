"""Minimal Waymo Open Dataset frame decoding without the waymo_open_dataset
package: a pure-Python protobuf wire-format parser + typed accessors for the
fields the preprocessing pipeline needs.

The field numbers follow the PUBLIC waymo-open-dataset ``dataset.proto`` /
``label.proto`` schema (the reference's preprocess.py consumes the same
messages through the official bindings — SURVEY.md §2.5 preprocessing row).
Only the subset used by ``tools/preprocess_waymo.py`` is mapped: frame pose,
camera/laser calibrations, camera JPEGs, range images (+ per-pixel pose for
the TOP lidar), and laser labels (3D boxes + track ids).

Also provides a tiny encoder for the same subset, used by the test suite to
synthesize valid tfrecords.
"""
from __future__ import annotations

import struct
import zlib
from typing import Any, Dict, Iterator, List, Optional, Tuple

import numpy as np

# enum names (dataset.proto CameraName / LaserName)
CAMERA_NAMES = {1: "FRONT", 2: "FRONT_LEFT", 3: "FRONT_RIGHT",
                4: "SIDE_LEFT", 5: "SIDE_RIGHT"}
LASER_NAMES = {1: "TOP", 2: "FRONT", 3: "SIDE_LEFT", 4: "SIDE_RIGHT",
               5: "REAR"}
LABEL_TYPES = {0: "Unknown", 1: "Vehicle", 2: "Pedestrian", 3: "Sign",
               4: "Cyclist"}


# ---------------------------------------------------------------------------
# tfrecord framing (pure python; masked-crc32c checksums are skipped)
# ---------------------------------------------------------------------------

def iter_tfrecord(path: str) -> Iterator[bytes]:
    with open(path, "rb") as f:
        while True:
            head = f.read(8)
            if len(head) < 8:
                return
            (length,) = struct.unpack("<Q", head)
            f.read(4)                       # length crc
            payload = f.read(length)
            f.read(4)                       # data crc
            if len(payload) < length:
                return
            yield payload


def write_tfrecord(path: str, records: List[bytes]) -> None:
    with open(path, "wb") as f:
        for rec in records:
            f.write(struct.pack("<Q", len(rec)))
            f.write(b"\x00" * 4)
            f.write(rec)
            f.write(b"\x00" * 4)


# ---------------------------------------------------------------------------
# protobuf wire format
# ---------------------------------------------------------------------------

def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    out = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        out |= (b & 0x7F) << shift
        if not b & 0x80:
            return out, i
        shift += 7


def parse_fields(buf: bytes) -> Dict[int, List[Tuple[int, Any]]]:
    """-> {field_number: [(wire_type, raw_value), ...]} preserving order."""
    out: Dict[int, List[Tuple[int, Any]]] = {}
    i = 0
    n = len(buf)
    while i < n:
        key, i = _read_varint(buf, i)
        field, wt = key >> 3, key & 7
        if wt == 0:                         # varint
            v, i = _read_varint(buf, i)
        elif wt == 1:                       # 64-bit
            v = buf[i:i + 8]
            i += 8
        elif wt == 2:                       # length-delimited
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wt == 5:                       # 32-bit
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported wire type {wt}")
        out.setdefault(field, []).append((wt, v))
    return out


def _first(fields, num, default=None):
    vs = fields.get(num)
    return vs[0][1] if vs else default


def _varint(fields, num, default=0):
    vs = fields.get(num)
    return int(vs[0][1]) if vs else default


def _double(fields, num, default=0.0):
    vs = fields.get(num)
    if not vs:
        return default
    wt, raw = vs[0]
    return struct.unpack("<d", raw)[0]


def _packed_doubles(fields, num) -> np.ndarray:
    out = []
    for wt, raw in fields.get(num, []):
        if wt == 2:
            out.append(np.frombuffer(raw, "<f8"))
        else:
            out.append(np.asarray([struct.unpack("<d", raw)[0]]))
    return np.concatenate(out) if out else np.zeros(0)


def _packed_floats(fields, num) -> np.ndarray:
    out = []
    for wt, raw in fields.get(num, []):
        if wt == 2:
            out.append(np.frombuffer(raw, "<f4"))
        else:
            out.append(np.asarray([struct.unpack("<f", raw)[0]], np.float32))
    return np.concatenate(out) if out else np.zeros(0, np.float32)


def _packed_ints(fields, num) -> List[int]:
    out = []
    for wt, raw in fields.get(num, []):
        if wt == 2:
            i = 0
            while i < len(raw):
                v, i = _read_varint(raw, i)
                out.append(v)
        else:
            out.append(int(raw))
    return out


# ---------------------------------------------------------------------------
# typed message accessors
# ---------------------------------------------------------------------------

def _transform(buf: Optional[bytes]) -> np.ndarray:
    """Transform { repeated double transform = 1; } -> [4,4] row-major."""
    if not buf:
        return np.eye(4)
    t = _packed_doubles(parse_fields(buf), 1)
    return (t.reshape(4, 4) if t.size == 16 else np.eye(4)).astype(np.float64)


def _matrix_float(buf: Optional[bytes]) -> Optional[np.ndarray]:
    """MatrixFloat { repeated float data = 1; MatrixShape shape = 2; }"""
    if not buf:
        return None
    f = parse_fields(buf)
    data = _packed_floats(f, 1)
    shape_buf = _first(f, 2)
    if shape_buf is None:
        return data
    dims = _packed_ints(parse_fields(shape_buf), 1)
    return data.reshape(dims)


def _range_image(buf: Optional[bytes]) -> Dict[str, Optional[np.ndarray]]:
    """RangeImage { bytes range_image_compressed = 1;
    bytes camera_projection_compressed = 2;
    bytes range_image_pose_compressed = 3; MatrixFloat range_image = 4; }"""
    if not buf:
        return {"ri": None, "pose": None}
    f = parse_fields(buf)
    ri = None
    comp = _first(f, 1)
    if comp:
        ri = _matrix_float(zlib.decompress(comp))
    elif _first(f, 4) is not None:
        ri = _matrix_float(_first(f, 4))
    pose = None
    pcomp = _first(f, 3)
    if pcomp:
        pose = _matrix_float(zlib.decompress(pcomp))
    return {"ri": ri, "pose": pose}


def parse_frame(buf: bytes) -> Dict[str, Any]:
    """Frame { Context context = 1; int64 timestamp_micros = 2;
    Transform pose = 3; repeated CameraImage images = 4;
    repeated Laser lasers = 6; repeated Label laser_labels = 7; }"""
    f = parse_fields(buf)
    frame: Dict[str, Any] = {
        "timestamp_micros": _varint(f, 2),
        "pose": _transform(_first(f, 3)),
        "cameras": {}, "camera_calib": {}, "lasers": {},
        "laser_calib": {}, "labels": [], "context_name": "",
    }
    ctx = _first(f, 1)
    if ctx:
        cf = parse_fields(ctx)
        frame["context_name"] = (_first(cf, 1) or b"").decode("utf-8", "ignore")
        # CameraCalibration { name=1; repeated double intrinsic=2;
        #   Transform extrinsic=3; int32 width=4; int32 height=5; }
        for _, cal in cf.get(2, []):
            c = parse_fields(cal)
            name = CAMERA_NAMES.get(_varint(c, 1), str(_varint(c, 1)))
            frame["camera_calib"][name] = {
                "intrinsic": _packed_doubles(c, 2),
                "extrinsic": _transform(_first(c, 3)),
                "width": _varint(c, 4), "height": _varint(c, 5),
            }
        # LaserCalibration { name=1; repeated double beam_inclinations=2;
        #   double beam_inclination_min=3; double beam_inclination_max=4;
        #   Transform extrinsic=5; }
        for _, cal in cf.get(3, []):
            c = parse_fields(cal)
            name = LASER_NAMES.get(_varint(c, 1), str(_varint(c, 1)))
            frame["laser_calib"][name] = {
                "beam_inclinations": _packed_doubles(c, 2),
                "beam_inclination_min": _double(c, 3),
                "beam_inclination_max": _double(c, 4),
                "extrinsic": _transform(_first(c, 5)),
            }
    # CameraImage { name=1; bytes image=2; }
    for _, ci in f.get(4, []):
        c = parse_fields(ci)
        name = CAMERA_NAMES.get(_varint(c, 1), str(_varint(c, 1)))
        frame["cameras"][name] = _first(c, 2) or b""
    # Laser { name=1; RangeImage ri_return1=2; RangeImage ri_return2=3; }
    for _, la in f.get(6, []):
        c = parse_fields(la)
        name = LASER_NAMES.get(_varint(c, 1), str(_varint(c, 1)))
        frame["lasers"][name] = _range_image(_first(c, 2))
    # Label { Box box=1; Type type=3; string id=4; }
    # Box { center_x=1; center_y=2; center_z=3; width=4; length=5;
    #       height=6; heading=7; }
    for _, lb in f.get(7, []):
        c = parse_fields(lb)
        box_buf = _first(c, 1)
        if box_buf is None:
            continue
        b = parse_fields(box_buf)
        frame["labels"].append({
            "id": (_first(c, 4) or b"").decode("utf-8", "ignore"),
            "type": LABEL_TYPES.get(_varint(c, 3), "Unknown"),
            "center": np.array([_double(b, 1), _double(b, 2), _double(b, 3)]),
            "size": np.array([_double(b, 5), _double(b, 4), _double(b, 6)]),
            "heading": _double(b, 7),
        })
    return frame


# ---------------------------------------------------------------------------
# tiny encoder (tests synthesize tfrecords with it)
# ---------------------------------------------------------------------------

def _key(field: int, wt: int) -> bytes:
    return _enc_varint((field << 3) | wt)


def _enc_varint(v: int) -> bytes:
    out = b""
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def enc_len(field: int, payload: bytes) -> bytes:
    return _key(field, 2) + _enc_varint(len(payload)) + payload


def enc_varint_field(field: int, v: int) -> bytes:
    return _key(field, 0) + _enc_varint(v)


def enc_double(field: int, v: float) -> bytes:
    return _key(field, 1) + struct.pack("<d", v)


def enc_packed_doubles(field: int, vs) -> bytes:
    return enc_len(field, b"".join(struct.pack("<d", float(v)) for v in vs))


def enc_packed_floats(field: int, vs) -> bytes:
    return enc_len(field, np.asarray(vs, "<f4").tobytes())


def enc_transform(field: int, mat: np.ndarray) -> bytes:
    return enc_len(field, enc_packed_doubles(1, np.asarray(mat).reshape(-1)))


def _enc_packed_ints(field: int, vs) -> bytes:
    return enc_len(field, b"".join(_enc_varint(int(v)) for v in vs))


def enc_matrix_float(arr: np.ndarray) -> bytes:
    """MatrixFloat { repeated float data = 1; MatrixShape shape = 2; }"""
    shape = enc_len(2, _enc_packed_ints(1, arr.shape))
    return enc_packed_floats(1, arr.reshape(-1)) + shape
