"""Typed command-surface export (tauri-specta analog).

The reference generates `src/bindings.ts` from its command registry at
build time (lib.rs:254-369). This module introspects the Commands class
and emits the same kind of typed surface for shell implementers: a JSON
description (name, parameters, annotations, doc) and a TypeScript
declaration rendering. The export is deterministic, so shells can diff it
across versions.
"""

from __future__ import annotations

import inspect
import json
import re
from typing import Any, Dict, List

from .commands import Commands

_TS_TYPES = {
    "bool": "boolean",
    "int": "number",
    "float": "number",
    "str": "string",
    "None": "void",
    "NoneType": "void",
}


def _annotation_to_ts(ann: Any) -> str:
    if ann is inspect.Parameter.empty:
        return "unknown"
    name = getattr(ann, "__name__", None) or str(ann)
    name = str(name)
    # Optional[str] / List[str] / Dict[...] best-effort rendering
    m = re.match(r"typing\.Optional\[(.+)\]", name)
    if m:
        return f"{_TS_TYPES.get(m.group(1), m.group(1))} | null"
    m = re.match(r"(?:typing\.)?List\[(.+)\]", name)
    if m:
        return f"{_TS_TYPES.get(m.group(1), 'unknown')}[]"
    if name.startswith("Optional["):
        inner = name[9:-1]
        return f"{_TS_TYPES.get(inner, inner)} | null"
    return _TS_TYPES.get(name, name)


def describe_commands() -> List[Dict[str, Any]]:
    out = []
    for name, fn in sorted(vars(Commands).items()):
        if name.startswith("_") or not callable(fn):
            continue
        sig = inspect.signature(fn)
        params = []
        for pname, p in sig.parameters.items():
            if pname == "self":
                continue
            params.append({
                "name": pname,
                "type": _annotation_to_ts(p.annotation),
                "optional": p.default is not inspect.Parameter.empty,
            })
        out.append({
            "name": name,
            "camelName": re.sub(r"_(\w)", lambda m: m.group(1).upper(), name),
            "params": params,
            "returns": _annotation_to_ts(sig.return_annotation),
            "doc": (inspect.getdoc(fn) or "").split("\n")[0],
        })
    return out


def export_json() -> str:
    return json.dumps(describe_commands(), indent=2)


def export_dts() -> str:
    """TypeScript declaration of the command surface."""
    lines = [
        "// Auto-generated from spittle_tpu.app.commands (bindings export).",
        "// Counterpart of the reference's tauri-specta src/bindings.ts.",
        "export interface SpittleCommands {",
    ]
    for cmd in describe_commands():
        params = ", ".join(
            f"{p['name']}{'?' if p['optional'] else ''}: {p['type']}"
            for p in cmd["params"]
        )
        ret = cmd["returns"]
        ret = "void" if ret in ("unknown", "None") else ret
        if cmd["doc"]:
            lines.append(f"  /** {cmd['doc']} */")
        lines.append(f"  {cmd['camelName']}({params}): Promise<{ret}>;")
    lines.append("}")
    return "\n".join(lines) + "\n"
