"""Static analysis of the operator-console JS (api/static/*.js).

This image ships NO JavaScript engine (no node/quickjs/dukpy — checked
each round), so the console's render paths cannot be EXECUTED in CI;
the honest maximum is static verification + the route-coverage test
(test_api_browse.py::test_console_js_urls_resolve_to_routes) + live
server drives of the fetch sequences. These tests pin the static
contracts that broke or nearly broke in past rounds:

1. Every function invoked from an inline onclick handler is defined in
   some console module (a renamed handler silently breaks a button).
2. Every UI.* member the views use is exported from core.js.
3. Inline-handler injection regression (round-4 advisor finding):
   no dynamic `${...}` interpolation may appear inside aSINGLE-quoted
   JS string in an onclick attribute — dynamic args must go through
   UI.d('${UI.arg(...)}') (percent-encoding incl. single quotes).
4. Structural sanity per file: balanced backticks/braces/parens
   outside string literals.
"""
import re
from pathlib import Path

import pytest

STATIC = Path(__file__).resolve().parent.parent / (
    "mobius_rag_tpu/api/static")
JS_FILES = sorted(STATIC.glob("*.js"))


def _sources():
    return {p.name: p.read_text() for p in JS_FILES}


def test_static_dir_present():
    assert JS_FILES, STATIC


def test_onclick_handlers_are_defined():
    srcs = _sources()
    all_src = "\n".join(srcs.values())
    defined = set(re.findall(
        r"(?:function\s+(\w+)|(?:const|let)\s+(\w+)\s*=\s*(?:async\s*)?\()",
        all_src))
    names = {a or b for a, b in defined}
    # window-level assignments too
    names |= set(re.findall(r"window\.(\w+)\s*=", all_src))
    builtin = {"event", "UI", "document", "window", "alert", "confirm",
               "prompt", "fetch", "console"}
    missing = []
    for fname, src in srcs.items():
        src = re.sub(r"^\s*//[^\n]*", "", src, flags=re.M)
        for m in re.finditer(r'onclick="([^"]*)"', src):
            for call in re.findall(r"(?<![.\w])(\w+)\s*\(", m.group(1)):
                if call not in names and call not in builtin \
                        and not hasattr(str, call):
                    missing.append((fname, call))
    assert not missing, f"onclick references undefined handlers: {missing}"


def test_ui_members_are_exported():
    srcs = _sources()
    core = srcs["core.js"]
    exported = set(re.findall(r"return \{([^}]*)\}", core)[-1]
                   .replace(" ", "").split(","))
    used = set()
    for fname, src in srcs.items():
        if fname == "core.js":
            continue
        used |= set(re.findall(r"UI\.(\w+)", src))
    missing = used - exported
    assert not missing, f"views use unexported UI members: {missing}"


def test_no_raw_interpolation_in_inline_handlers():
    """Regression for the stored-injection finding: a template
    `${...}` inside a single-quoted string in an onclick attribute can
    break out via a ' in the value. Dynamic args must be wrapped as
    UI.d('${UI.arg(...)}')."""
    bad = []
    for fname, src in _sources().items():
        for m in re.finditer(r'onclick="([^"]*)"', src):
            body = m.group(1)
            for lit in re.findall(r"'([^']*)'", body):
                if "${" in lit and "UI.arg(" not in lit:
                    bad.append((fname, body[:90]))
    assert not bad, f"unescaped interpolation in inline handlers: {bad}"


@pytest.mark.parametrize("path", JS_FILES, ids=lambda p: p.name)
def test_balanced_delimiters(path):
    src = path.read_text()
    # strip comments and string/template bodies conservatively
    src = re.sub(r"//[^\n]*", "", src)
    src = re.sub(r"/\*.*?\*/", "", src, flags=re.S)
    assert src.count("`") % 2 == 0, "unbalanced template literals"
    stripped = re.sub(r"`[^`]*`", "", src, flags=re.S)
    stripped = re.sub(r"'(?:[^'\\\n]|\\.)*'", "", stripped)
    stripped = re.sub(r'"(?:[^"\\\n]|\\.)*"', "", stripped)
    for open_c, close_c in ("{}", "()", "[]"):
        assert stripped.count(open_c) == stripped.count(close_c), (
            path.name, open_c, stripped.count(open_c),
            stripped.count(close_c))
