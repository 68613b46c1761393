#!/usr/bin/env python
"""Regenerate docs/API.md from the public API surface.

The reference ships sphinx-generated API docs (``docs/source/apis``); this
is the self-contained equivalent: every ``nerfacc_tpu.__all__`` name with
its signature and docstring summary.
"""

from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import inspect
import pathlib

import jax

jax.config.update("jax_platforms", "cpu")

import nerfacc_tpu as na  # noqa: E402

ROOT = pathlib.Path(__file__).resolve().parent.parent


def main():
    lines = [
        "# nerfacc_tpu public API",
        "",
        "Generated from the package docstrings"
        " (`python scripts/gen_api_doc.py`).",
        "Parity names match `nerfacc.__init__`"
        " (see `docs/PARITY.md` for the map).",
        "",
    ]
    for name in sorted(na.__all__):
        obj = getattr(na, name)
        if name == "__version__" or isinstance(obj, str):
            continue
        try:
            sig = str(inspect.signature(obj))
        except (ValueError, TypeError):
            sig = ""
        doc = inspect.getdoc(obj) or ""
        first = doc.split("\n\n")[0].replace("\n", " ") if doc else ""
        kind = "class" if inspect.isclass(obj) else "function"
        lines.append(f"## `{name}`")
        lines.append("")
        lines.append(f"*{kind}* `{name}{sig}`")
        lines.append("")
        if first:
            lines.append(first)
            lines.append("")
        if inspect.isclass(obj):
            for mname, m in sorted(vars(obj).items()):
                if mname.startswith("_") or not callable(m):
                    continue
                try:
                    msig = str(inspect.signature(m))
                except (ValueError, TypeError):
                    msig = "(...)"
                mdoc = (inspect.getdoc(m) or "").split("\n")[0]
                lines.append(f"- `.{mname}{msig}` — {mdoc}")
            lines.append("")
    (ROOT / "docs" / "API.md").write_text("\n".join(lines) + "\n")
    print(f"wrote docs/API.md ({len(lines)} lines)")


if __name__ == "__main__":
    main()
