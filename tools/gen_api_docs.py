"""Generate docs/api.md — a module/class/function reference from the
package's docstrings (the reference ships a Doxyfile for the same purpose,
`/root/reference/Doxyfile`; here the docstrings are the single source and
this renders them to markdown).

    python tools/gen_api_docs.py          # rewrites docs/api.md
"""

from __future__ import annotations

import os as _os
import sys as _sys
_sys.path.insert(0, _os.path.dirname(_os.path.dirname(_os.path.abspath(__file__))))

import importlib
import inspect
import pkgutil


def _first_para(doc: str | None) -> str:
    if not doc:
        return ""
    return inspect.cleandoc(doc).split("\n\n")[0].strip()


def _sig(obj) -> str:
    try:
        return str(inspect.signature(obj))
    except (TypeError, ValueError):
        return "(…)"


def main() -> None:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import blah2_tpu

    lines = [
        "# API reference",
        "",
        "Generated from docstrings by `tools/gen_api_docs.py` "
        "(regenerate after adding modules). One entry per public module; "
        "first docstring paragraph plus public classes/functions. "
        "Reference parity citations (`src/...`) live in the full "
        "docstrings in-source.",
        "",
    ]
    mods = sorted(
        m.name for m in pkgutil.walk_packages(
            blah2_tpu.__path__, prefix="blah2_tpu.")
        if not m.name.rsplit(".", 1)[-1].startswith("_"))
    for name in mods:
        try:
            mod = importlib.import_module(name)
        except Exception as e:  # vendor shims etc. may need hardware
            lines += [f"## `{name}`", "", f"*(import skipped: {e})*", ""]
            continue
        lines += [f"## `{name}`", ""]
        para = _first_para(mod.__doc__)
        if para:
            lines += [para, ""]
        members = []
        for attr, obj in sorted(vars(mod).items()):
            if attr.startswith("_"):
                continue
            if getattr(obj, "__module__", None) != name:
                continue  # re-exports documented where defined
            if inspect.isclass(obj):
                members.append(
                    f"- **class `{attr}`** — {_first_para(obj.__doc__)}")
                for m_name, m in sorted(vars(obj).items()):
                    if m_name.startswith("_") or not inspect.isfunction(m):
                        continue
                    members.append(
                        f"  - `{m_name}{_sig(m)}` — "
                        f"{_first_para(m.__doc__)}")
            elif inspect.isfunction(obj):
                members.append(
                    f"- `{attr}{_sig(obj)}` — {_first_para(obj.__doc__)}")
        lines += members + ([""] if members else [])
    out = _os.path.join(_os.path.dirname(_os.path.dirname(
        _os.path.abspath(__file__))), "docs", "api.md")
    with open(out, "w") as f:
        f.write("\n".join(lines).rstrip() + "\n")
    print(f"wrote {out}: {len(mods)} modules")


if __name__ == "__main__":
    main()
