"""Minimal ONNX protobuf reader (no onnx/protobuf dependency).

Parses just enough of the ONNX wire format to import inference graphs:
ModelProto -> GraphProto -> NodeProto/TensorProto/AttributeProto, including
nested subgraphs (If/Loop bodies). Used to load the reference's bundled
Silero VAD v4 weights (`/root/reference/src-tauri/resources/models/
silero_vad_v4.onnx`, consumed by vad-rs in the reference at
`src-tauri/src/audio_toolkit/vad/silero.rs`) and as the general ONNX import
path of the framework.

Only the fields required for inference are decoded; unknown fields are
skipped per protobuf rules.
"""

from __future__ import annotations

import struct
from dataclasses import dataclass, field
from typing import Dict, List, Optional, Tuple

import numpy as np

# TensorProto.DataType -> numpy dtype
_DTYPES = {
    1: np.float32,
    2: np.uint8,
    3: np.int8,
    4: np.uint16,
    5: np.int16,
    6: np.int32,
    7: np.int64,
    9: np.bool_,
    10: np.float16,
    11: np.float64,
    12: np.uint32,
    13: np.uint64,
}


def _read_varint(buf: bytes, i: int) -> Tuple[int, int]:
    result = 0
    shift = 0
    while True:
        b = buf[i]
        i += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, i
        shift += 7


def _iter_fields(buf: bytes, start: int, end: int):
    """Yield (field_number, wire_type, value) where value is an int for
    varint fields, a (start, end) span for length-delimited fields, and raw
    bytes for fixed32/fixed64."""
    i = start
    while i < end:
        tag, i = _read_varint(buf, i)
        fnum, wt = tag >> 3, tag & 7
        if wt == 0:
            v, i = _read_varint(buf, i)
            yield fnum, wt, v
        elif wt == 2:
            ln, i = _read_varint(buf, i)
            yield fnum, wt, (i, i + ln)
            i += ln
        elif wt == 5:
            yield fnum, wt, buf[i : i + 4]
            i += 4
        elif wt == 1:
            yield fnum, wt, buf[i : i + 8]
            i += 8
        else:
            raise ValueError(f"unsupported wire type {wt}")


@dataclass
class Attribute:
    name: str = ""
    # AttributeProto type tags: f=1, i=2, s=3, t=4, g=5, floats=6, ints=7,
    # strings=8, tensors=9, graphs=10
    f: Optional[float] = None
    i: Optional[int] = None
    s: Optional[bytes] = None
    t: Optional[np.ndarray] = None
    g: Optional["Graph"] = None
    floats: List[float] = field(default_factory=list)
    ints: List[int] = field(default_factory=list)

    @property
    def value(self):
        for v in (self.g, self.t, self.s, self.i, self.f):
            if v is not None:
                return v
        if self.ints:
            return self.ints
        if self.floats:
            return self.floats
        return None


@dataclass
class Node:
    op_type: str
    inputs: List[str]
    outputs: List[str]
    name: str = ""
    attrs: Dict[str, Attribute] = field(default_factory=dict)

    def attr(self, name: str, default=None):
        a = self.attrs.get(name)
        return default if a is None else a.value


@dataclass
class Graph:
    name: str = ""
    nodes: List[Node] = field(default_factory=list)
    initializers: Dict[str, np.ndarray] = field(default_factory=dict)
    inputs: List[str] = field(default_factory=list)
    outputs: List[str] = field(default_factory=list)


def _parse_tensor(buf: bytes, span: Tuple[int, int]) -> Tuple[str, np.ndarray]:
    dims: List[int] = []
    dtype_tag = 1
    name = ""
    raw: Optional[bytes] = None
    int64_data: List[int] = []
    float_data: List[float] = []
    int32_data: List[int] = []
    for fnum, wt, v in _iter_fields(buf, *span):
        if fnum == 1 and wt == 0:
            dims.append(v)
        elif fnum == 2 and wt == 0:
            dtype_tag = v
        elif fnum == 4 and wt == 2:  # packed float_data
            s, e = v
            float_data.extend(struct.unpack(f"<{(e - s) // 4}f", buf[s:e]))
        elif fnum == 4 and wt == 5:
            float_data.append(struct.unpack("<f", v)[0])
        elif fnum == 5 and wt == 0:  # int32_data element
            int32_data.append(v)
        elif fnum == 5 and wt == 2:  # packed int32_data
            s, e = v
            i = s
            while i < e:
                x, i = _read_varint(buf, i)
                int32_data.append(x)
        elif fnum == 7 and wt == 2:  # packed int64_data
            s, e = v
            i = s
            while i < e:
                x, i = _read_varint(buf, i)
                int64_data.append(x - (1 << 64) if x >= (1 << 63) else x)
        elif fnum == 7 and wt == 0:
            int64_data.append(v - (1 << 64) if v >= (1 << 63) else v)
        elif fnum == 8 and wt == 2:
            name = buf[v[0] : v[1]].decode()
        elif fnum == 9 and wt == 2:
            raw = buf[v[0] : v[1]]
    dtype = _DTYPES.get(dtype_tag)
    if dtype is None:
        raise ValueError(f"unsupported tensor dtype tag {dtype_tag} for {name}")
    if raw is not None:
        arr = np.frombuffer(raw, dtype=dtype)
    elif float_data:
        arr = np.asarray(float_data, dtype=dtype)
    elif int64_data:
        arr = np.asarray(int64_data, dtype=dtype)
    elif int32_data:
        arr = np.asarray(int32_data, dtype=dtype)
    else:
        arr = np.zeros(0, dtype=dtype)
    return name, arr.reshape(dims) if dims else arr.reshape(())


def _parse_attribute(buf: bytes, span: Tuple[int, int]) -> Attribute:
    a = Attribute()
    for fnum, wt, v in _iter_fields(buf, *span):
        if fnum == 1 and wt == 2:
            a.name = buf[v[0] : v[1]].decode()
        elif fnum == 2 and wt == 5:
            a.f = struct.unpack("<f", v)[0]
        elif fnum == 3 and wt == 0:
            a.i = v - (1 << 64) if v >= (1 << 63) else v
        elif fnum == 4 and wt == 2:
            a.s = buf[v[0] : v[1]]
        elif fnum == 5 and wt == 2:
            _, a.t = _parse_tensor(buf, v)
        elif fnum == 6 and wt == 2:
            a.g = _parse_graph(buf, v)
        elif fnum == 7 and wt == 5:
            a.floats.append(struct.unpack("<f", v)[0])
        elif fnum == 8 and wt == 0:
            a.ints.append(v - (1 << 64) if v >= (1 << 63) else v)
    return a


def _parse_node(buf: bytes, span: Tuple[int, int]) -> Node:
    inputs: List[str] = []
    outputs: List[str] = []
    name = ""
    op_type = ""
    attrs: Dict[str, Attribute] = {}
    for fnum, wt, v in _iter_fields(buf, *span):
        if fnum == 1 and wt == 2:
            inputs.append(buf[v[0] : v[1]].decode())
        elif fnum == 2 and wt == 2:
            outputs.append(buf[v[0] : v[1]].decode())
        elif fnum == 3 and wt == 2:
            name = buf[v[0] : v[1]].decode()
        elif fnum == 4 and wt == 2:
            op_type = buf[v[0] : v[1]].decode()
        elif fnum == 5 and wt == 2:
            a = _parse_attribute(buf, v)
            attrs[a.name] = a
    return Node(op_type=op_type, inputs=inputs, outputs=outputs, name=name, attrs=attrs)


def _value_info_name(buf: bytes, span: Tuple[int, int]) -> str:
    for fnum, wt, v in _iter_fields(buf, *span):
        if fnum == 1 and wt == 2:
            return buf[v[0] : v[1]].decode()
    return ""


def _parse_graph(buf: bytes, span: Tuple[int, int]) -> Graph:
    g = Graph()
    for fnum, wt, v in _iter_fields(buf, *span):
        if fnum == 1 and wt == 2:
            g.nodes.append(_parse_node(buf, v))
        elif fnum == 2 and wt == 2:
            g.name = buf[v[0] : v[1]].decode()
        elif fnum == 5 and wt == 2:
            name, arr = _parse_tensor(buf, v)
            g.initializers[name] = arr
        elif fnum == 11 and wt == 2:
            g.inputs.append(_value_info_name(buf, v))
        elif fnum == 12 and wt == 2:
            g.outputs.append(_value_info_name(buf, v))
    return g


def load_onnx(path: str) -> Graph:
    """Parse an ONNX file and return its top-level graph."""
    with open(path, "rb") as f:
        buf = f.read()
    for fnum, wt, v in _iter_fields(buf, 0, len(buf)):
        if fnum == 7 and wt == 2:  # ModelProto.graph
            return _parse_graph(buf, v)
    raise ValueError(f"{path}: no graph found")
