"""Reference numpy interpreter for imported ONNX graphs.

Executes the op subset needed by the models Spittle bundles/downloads
(Silero VAD v4 today; the conv/LSTM/elementwise family generally). Serves
as the slow-but-faithful oracle that the fast JAX implementations are
tested against, and as a generic CPU fallback for ONNX import.

Not a performance path: the TPU implementations in spittle_tpu.audio.vad
and spittle_tpu.models are the production engines.
"""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

from .onnx_proto import Graph, Node


def _conv(x, w, b=None, group=1, strides=(1,), pads=(0, 0), dilations=(1,)):
    """1D convolution, NCW layout, matching ONNX Conv semantics."""
    assert x.ndim == 3 and w.ndim == 3, (x.shape, w.shape)
    n, cin, width = x.shape
    cout, cin_g, k = w.shape
    stride = strides[0]
    dil = dilations[0]
    pl, pr = pads
    xp = np.pad(x, ((0, 0), (0, 0), (pl, pr)))
    eff_k = (k - 1) * dil + 1
    out_w = (xp.shape[2] - eff_k) // stride + 1
    out = np.zeros((n, cout, out_w), dtype=np.result_type(x, w))
    cout_per_g = cout // group
    for g in range(group):
        xg = xp[:, g * cin_g : (g + 1) * cin_g]  # [n, cin_g, W]
        wg = w[g * cout_per_g : (g + 1) * cout_per_g]  # [cout_g, cin_g, k]
        # im2col: [n, cin_g*k, out_w]
        cols = np.stack(
            [
                xg[:, :, i * dil : i * dil + out_w * stride : stride]
                for i in range(k)
            ],
            axis=2,
        ).reshape(n, cin_g * k, out_w)
        out[:, g * cout_per_g : (g + 1) * cout_per_g] = np.einsum(
            "ok,nkw->now", wg.reshape(cout_per_g, cin_g * k), cols
        )
    if b is not None:
        out += b[None, :, None]
    return out


def _sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def _lstm(x, w, r, b, h0, c0, hidden_size):
    """ONNX LSTM, forward direction, layout=0.

    x: [T, N, I]; w: [1, 4H, I]; r: [1, 4H, H]; b: [1, 8H];
    h0/c0: [1, N, H]. Gate order i, o, f, c (ONNX spec).
    Returns (Y [T, 1, N, H], h [1, N, H], c [1, N, H]).
    """
    T, N, _ = x.shape
    H = hidden_size
    wt = w[0].T  # [I, 4H]
    rt = r[0].T  # [H, 4H]
    wb = b[0, : 4 * H] + b[0, 4 * H :]  # [4H]
    h = h0[0].copy()
    c = c0[0].copy()
    ys = np.zeros((T, 1, N, H), dtype=x.dtype)
    for t in range(T):
        gates = x[t] @ wt + h @ rt + wb  # [N, 4H]
        i = _sigmoid(gates[:, 0:H])
        o = _sigmoid(gates[:, H : 2 * H])
        f = _sigmoid(gates[:, 2 * H : 3 * H])
        g = np.tanh(gates[:, 3 * H : 4 * H])
        c = f * c + i * g
        h = o * np.tanh(c)
        ys[t, 0] = h
    return ys, h[None], c[None]


class OnnxInterpreter:
    """Execute a parsed ONNX graph on numpy inputs."""

    def __init__(self, graph: Graph):
        self.graph = graph

    def run(self, feeds: Dict[str, np.ndarray]) -> Dict[str, np.ndarray]:
        env: Dict[str, np.ndarray] = dict(self.graph.initializers)
        env.update({k: np.asarray(v) for k, v in feeds.items()})
        self._exec_nodes(self.graph.nodes, env)
        return {name: env[name] for name in self.graph.outputs}

    # -- op dispatch ------------------------------------------------------

    def _exec_nodes(self, nodes: Sequence[Node], env: Dict[str, np.ndarray]):
        for node in nodes:
            handler = getattr(self, f"_op_{node.op_type.lower()}", None)
            if handler is None:
                raise NotImplementedError(f"ONNX op {node.op_type}")
            ins = [env[i] if i else None for i in node.inputs]
            outs = handler(node, ins, env)
            if not isinstance(outs, (tuple, list)):
                outs = (outs,)
            for name, val in zip(node.outputs, outs):
                env[name] = val

    def _op_identity(self, node, ins, env):
        return ins[0]

    def _op_shape(self, node, ins, env):
        start = node.attr("start", 0) or 0
        return np.asarray(ins[0].shape[start:], dtype=np.int64)

    def _op_gather(self, node, ins, env):
        axis = node.attr("axis", 0) or 0
        return np.take(ins[0], ins[1].astype(np.int64), axis=axis)

    def _op_unsqueeze(self, node, ins, env):
        axes = ins[1] if len(ins) > 1 else np.asarray(node.attr("axes"))
        out = ins[0]
        for ax in sorted(int(a) for a in np.atleast_1d(axes)):
            out = np.expand_dims(out, ax)
        return out

    def _op_squeeze(self, node, ins, env):
        if len(ins) > 1 and ins[1] is not None:
            axes = tuple(int(a) for a in np.atleast_1d(ins[1]))
            return np.squeeze(ins[0], axis=axes)
        return np.squeeze(ins[0])

    def _op_concat(self, node, ins, env):
        return np.concatenate(ins, axis=node.attr("axis", 0))

    def _op_reshape(self, node, ins, env):
        return ins[0].reshape(tuple(int(d) for d in ins[1]))

    def _op_pad(self, node, ins, env):
        mode = (node.attr("mode") or b"constant").decode()
        pads = np.atleast_1d(ins[1]).astype(np.int64)
        rank = ins[0].ndim
        pairs = [(int(pads[i]), int(pads[i + rank])) for i in range(rank)]
        np_mode = {"constant": "constant", "reflect": "reflect", "edge": "edge"}[mode]
        return np.pad(ins[0], pairs, mode=np_mode)

    def _op_equal(self, node, ins, env):
        return np.equal(ins[0], ins[1])

    def _op_cast(self, node, ins, env):
        from .onnx_proto import _DTYPES

        return ins[0].astype(_DTYPES[node.attr("to")])

    def _op_if(self, node, ins, env):
        cond = bool(np.asarray(ins[0]).reshape(()))
        branch: Graph = node.attr("then_branch" if cond else "else_branch")
        sub_env = dict(env)
        sub_env.update(branch.initializers)
        self._exec_nodes(branch.nodes, sub_env)
        return tuple(sub_env[name] for name in branch.outputs)

    def _op_conv(self, node, ins, env):
        return _conv(
            ins[0],
            ins[1],
            ins[2] if len(ins) > 2 else None,
            group=node.attr("group", 1) or 1,
            strides=tuple(node.attr("strides", [1])),
            pads=tuple(node.attr("pads", [0, 0])),
            dilations=tuple(node.attr("dilations", [1])),
        )

    def _op_slice(self, node, ins, env):
        data, starts, ends = ins[0], ins[1], ins[2]
        axes = ins[3] if len(ins) > 3 and ins[3] is not None else np.arange(len(starts))
        steps = ins[4] if len(ins) > 4 and ins[4] is not None else np.ones(len(starts), np.int64)
        slices = [slice(None)] * data.ndim
        for s, e, a, st in zip(starts, ends, np.atleast_1d(axes), np.atleast_1d(steps)):
            a = int(a) % data.ndim
            s, e, st = int(s), int(e), int(st)
            # ONNX clamps INT64_MAX/MIN-ish sentinels
            e = None if e >= 2**62 else e
            s = None if s <= -(2**62) else s
            slices[a] = slice(s, e, st)
        return data[tuple(slices)]

    def _op_pow(self, node, ins, env):
        return np.power(ins[0], ins[1])

    def _op_add(self, node, ins, env):
        return ins[0] + ins[1]

    def _op_mul(self, node, ins, env):
        return ins[0] * ins[1]

    def _op_neg(self, node, ins, env):
        return -ins[0]

    def _op_sqrt(self, node, ins, env):
        return np.sqrt(ins[0])

    def _op_log(self, node, ins, env):
        return np.log(ins[0])

    def _op_relu(self, node, ins, env):
        return np.maximum(ins[0], 0)

    def _op_sigmoid(self, node, ins, env):
        return _sigmoid(ins[0])

    def _op_reducemean(self, node, ins, env):
        axes = node.attr("axes")
        keepdims = bool(node.attr("keepdims", 1))
        if axes is None:
            return np.mean(ins[0], keepdims=keepdims)
        axes = tuple(int(a) if a < 2**62 else -1 for a in axes)
        return np.mean(ins[0], axis=axes, keepdims=keepdims)

    def _op_transpose(self, node, ins, env):
        return np.transpose(ins[0], node.attr("perm"))

    def _op_constantofshape(self, node, ins, env):
        t = node.attr("value")
        fill = t.reshape(-1)[0] if t is not None and t.size else np.float32(0)
        return np.full(tuple(int(d) for d in ins[0]), fill, dtype=fill.dtype)

    def _op_lstm(self, node, ins, env):
        x, w, r, b = ins[0], ins[1], ins[2], ins[3]
        h0 = ins[5] if len(ins) > 5 and ins[5] is not None else None
        c0 = ins[6] if len(ins) > 6 and ins[6] is not None else None
        hidden = node.attr("hidden_size")
        if h0 is None:
            h0 = np.zeros((1, x.shape[1], hidden), dtype=x.dtype)
        if c0 is None:
            c0 = np.zeros((1, x.shape[1], hidden), dtype=x.dtype)
        return _lstm(x, w, r, b, h0, c0, hidden)
