"""OMML (Office Math Markup Language) → LaTeX — from-scratch stdlib
port of the observable semantics of the reference's vendored dwml
converter (/root/reference/docling/backend/docx/latex/omml.py:1-450 +
latex_dict.py, itself adapted from the public dwml package; dwml and
the OMML spec are the public constructions this follows).

Structure handlers: runs, sub/superscripts, fractions (bar / noBar →
\\genfrac / linear / skewed), delimiters (\\left..\\right), n-ary
operators with limits, function application (sin/cos/...), radicals,
bars, accents, group characters, equation arrays, upper/lower limits,
matrices.

Per-character text conversion emulates the reference's
pylatexenc-with-braces-all pipeline (not installed here) collapsed to
its net effect: math-mode symbols land as "  \\cmd  ", text-mode
macros as " \\text{ \\cmd } ", simple replacements as " s ", ASCII
passes through; the final string collapses double spaces once, exactly
like ``str(oMath2Latex(...))``.
"""

from __future__ import annotations

from xml.etree import ElementTree as ET  # noqa: F401 (callers pass elements)

_M = "{http://schemas.openxmlformats.org/officeDocument/2006/math}"

_ESCAPE_CHARS = ("{", "}", "_", "^", "#", "&", "$", "%", "~")

# n-ary big operators (latex_dict.CHR_BO)
_CHR_BO = {
    "⅀": "\\Bbbsum", "∏": "\\prod", "∐": "\\coprod",
    "∑": "\\sum", "∫": "\\int", "⋀": "\\bigwedge",
    "⋁": "\\bigvee", "⋂": "\\bigcap", "⋃": "\\bigcup",
    "⨀": "\\bigodot", "⨁": "\\bigoplus", "⨂": "\\bigotimes",
}

_FUNC = {name: f"\\{name}({{fe}})" for name in (
    "sin", "cos", "tan", "arcsin", "arccos", "arctan", "arccot",
    "sinh", "cosh", "tanh", "coth", "sec", "csc", "max", "min",
)}
_FUNC["mod"] = "\\mod {fe}"
_FUNC_PLACE = "{fe}"

_F_TYPES = {
    "bar": "\\frac{{{num}}}{{{den}}}",
    "skw": r"^{{{num}}}/_{{{den}}}",
    "noBar": "\\genfrac{{}}{{}}{{0pt}}{{}}{{{num}}}{{{den}}}",
    "lin": "{{{num}}}/{{{den}}}",
}
_F_DEFAULT = "\\frac{{{num}}}{{{den}}}"

_ACCENTS = {
    "̂": "\\hat{{{0}}}", "̃": "\\tilde{{{0}}}",
    "̄": "\\bar{{{0}}}", "̅": "\\overbar{{{0}}}",
    "̇": "\\dot{{{0}}}", "̈": "\\ddot{{{0}}}",
    "⃗": "\\vec{{{0}}}",
    "⏞": "\\overbrace{{{0}}}", "⏟": "\\underbrace{{{0}}}",
}
_ACC_DEFAULT = "\\hat{{{0}}}"

_GREEK = {
    "alpha": "α", "beta": "β", "gamma": "γ",
    "delta": "δ", "epsilon": "ε", "zeta": "ζ",
    "eta": "η", "theta": "θ", "iota": "ι",
    "kappa": "κ", "lambda": "λ", "mu": "μ",
    "nu": "ν", "xi": "ξ", "pi": "π", "rho": "ρ",
    "sigma": "σ", "tau": "τ", "upsilon": "υ",
    "phi": "φ", "chi": "χ", "psi": "ψ",
    "omega": "ω",
}

# char → ("math", cmd) | ("textcmd", cmd) | ("wrap", s); the pylatexenc
# subset the fixture corpus and common formulas need
_CHAR_MAP: dict[str, tuple[str, str]] = {}
for _name, _ch in _GREEK.items():
    _CHAR_MAP[_ch] = ("math", f"\\{_name}")
    _CHAR_MAP[chr(ord(_ch) - 32)] = ("math", f"\\{_name.capitalize()}")
_CHAR_MAP.update({
    "∞": ("math", "\\infty"),
    "±": ("math", "\\pm"), "∓": ("math", "\\mp"),
    "≤": ("math", "\\leq"), "≥": ("math", "\\geq"),
    "≠": ("math", "\\neq"), "∈": ("math", "\\in"),
    "→": ("math", "\\rightarrow"), "←": ("math", "\\leftarrow"),
    "⋅": ("math", "\\cdot"), "⋯": ("math", "\\cdots"),
    "∂": ("math", "\\partial"), "∇": ("math", "\\nabla"),
    "√": ("math", "\\surd"), "≈": ("math", "\\approx"),
    "×": ("textcmd", "\\texttimes"),
    "…": ("textcmd", "\\textellipsis"),
    "÷": ("textcmd", "\\textdiv"),
    "°": ("textcmd", "\\textdegree"),
    "−": ("wrap", "-"),
    "′": ("math", "'"),
    # pylatexenc routes <> through \ensuremath → padded like math cmds
    "<": ("math", "<"),
    ">": ("math", ">"),
})


def _process_unicode(ch: str) -> str:
    """omml.py:381-403 (process_unicode) net behavior per character."""
    entry = _CHAR_MAP.get(ch)
    if entry is None:
        return ch  # ASCII / unknown chars pass through (keep policy)
    kind, val = entry
    if kind == "math":
        return f"  {val}  "
    if kind == "textcmd":
        return f" \\text{{ {val} }} "
    return f" {val} "


def _escape_latex(s: str) -> str:
    """omml.py:59-69 (escape_latex)."""
    s = s.replace("\\\\", "\\")
    out = []
    last = None
    for c in s:
        if c in _ESCAPE_CHARS and last != "\\":
            out.append("\\" + c)
        else:
            out.append(c)
        last = c
    return "".join(out)


def _tag(el) -> str:
    t = el.tag if isinstance(el.tag, str) else ""
    return t.replace(_M, "")


class _Pr:
    """Property bag: chr / pos / begChr / endChr / type vals."""

    def __init__(self, el):
        self.vals: dict[str, str | None] = {}
        self.text = ""
        for child in el.iter():
            t = _tag(child)
            if t in ("chr", "pos", "begChr", "endChr", "type"):
                self.vals[t] = child.get(f"{_M}val")

    def get(self, name):
        return self.vals.get(name)


_DIRECT_TAGS = ("box", "sSub", "sSup", "sSubSup", "num", "den", "deg", "e")


def _children(el):
    for child in el:
        t = _tag(child)
        if t:
            yield t, child


def _process(el) -> str:
    parts = []
    for t, child in _children(el):
        s = _dispatch(t, child)
        if s is not None:
            parts.append(s)
    return "".join(parts)


def _dispatch(t: str, el) -> str | None:
    fn = _HANDLERS.get(t)
    if fn is not None:
        return fn(el)
    if t in _DIRECT_TAGS:
        return _process(el)
    return None  # property containers handled by their parents


def _do_r(el) -> str:
    texts = [n.text or "" for n in el.iter(f"{_M}t")]
    base = "".join(texts)
    proc = _escape_latex("".join(_process_unicode(c) for c in base))
    if "{" not in base and "\\{" in proc:
        proc = proc.replace("\\{", "{")
    if "}" not in base and "\\}" in proc:
        proc = proc.replace("\\}", "}")
    return proc


def _do_sub(el) -> str:
    return "_{" + _process(el) + "}"


def _do_sup(el) -> str:
    return "^{" + _process(el) + "}"


def _do_f(el) -> str:
    pr = None
    parts = {}
    for t, child in _children(el):
        if t == "fPr":
            pr = _Pr(child)
        elif t in ("num", "den"):
            parts[t] = _process(child)
    fmt = _F_TYPES.get(pr.get("type") if pr else None, _F_DEFAULT)
    return fmt.format(num=parts.get("num", ""), den=parts.get("den", ""))


def _do_d(el) -> str:
    pr = None
    body = []
    for t, child in _children(el):
        if t == "dPr":
            pr = _Pr(child)
        elif t == "e":
            body.append(_process(child))
    beg = pr.get("begChr") if pr else None
    end = pr.get("endChr") if pr else None
    left = "(" if beg is None else (_escape_latex(beg) if beg else ".")
    right = ")" if end is None else (_escape_latex(end) if end else ".")
    return f"\\left{left}{''.join(body)}\\right{right}"


def _do_nary(el) -> str:
    bo = ""
    parts = []
    for t, child in _children(el):
        if t == "naryPr":
            chrv = _Pr(child).get("chr")
            bo = _CHR_BO.get(chrv, chrv or "\\int")
        else:
            s = _dispatch(t, child)
            if s is not None:
                parts.append(s)
    return bo + "".join(parts)


def _do_func(el) -> str:
    fname = ""
    body = ""
    for t, child in _children(el):
        if t == "fName":
            fname = _do_fname(child)
        elif t == "e":
            body = _process(child)
    return fname.replace(_FUNC_PLACE, body)


def _do_fname(el) -> str:
    parts = []
    for t, child in _children(el):
        s = _dispatch(t, child)
        if s is None:
            continue
        if t == "r" and _FUNC.get(s):
            parts.append(_FUNC[s])
        else:
            parts.append(s)
    joined = "".join(parts)
    return joined if _FUNC_PLACE in joined else joined + _FUNC_PLACE


def _do_rad(el) -> str:
    deg = text = ""
    for t, child in _children(el):
        if t == "deg":
            deg = _process(child)
        elif t == "e":
            text = _process(child)
    return (f"\\sqrt[{deg}]{{{text}}}" if deg else f"\\sqrt{{{text}}}")


def _do_bar(el) -> str:
    pos = None
    body = ""
    for t, child in _children(el):
        if t == "barPr":
            pos = _Pr(child).get("pos")
        elif t == "e":
            body = _process(child)
    fmt = "\\underline{{{0}}}" if pos == "bot" else "\\overline{{{0}}}"
    return fmt.format(body)


def _do_acc(el) -> str:
    chrv = None
    body = ""
    for t, child in _children(el):
        if t == "accPr":
            chrv = _Pr(child).get("chr")
        elif t == "e":
            body = _process(child)
    fmt = _ACCENTS.get(chrv, _ACC_DEFAULT) if chrv else _ACC_DEFAULT
    return fmt.format(body)


def _do_groupchr(el) -> str:
    chrv = None
    body = ""
    for t, child in _children(el):
        if t == "groupChrPr":
            chrv = _Pr(child).get("chr")
        elif t == "e":
            body = _process(child)
    if chrv:
        return f"{chrv}{{{body}}}"
    return body


def _do_eqarr(el) -> str:
    rows = [_process(child) for t, child in _children(el) if t == "e"]
    return "\\\\".join(rows)


def _do_limlow(el) -> str:
    parts = {}
    for t, child in _children(el):
        if t in ("e", "lim"):
            parts[t] = _process(child)
    base = parts.get("e", "")
    fn = {"lim": "\\lim", "max": "\\max", "min": "\\min"}.get(base)
    if not fn:
        return base + "_{" + parts.get("lim", "") + "}"
    return f"{fn}_{{{parts.get('lim', '')}}}"


def _do_limupp(el) -> str:
    parts = {}
    for t, child in _children(el):
        if t in ("e", "lim"):
            parts[t] = _process(child)
    return (f"\\overset{{{parts.get('lim', '')}}}"
            f"{{{parts.get('e', '')}}}")


def _do_lim(el) -> str:
    return _process(el).replace("\\rightarrow", "\\to")


def _do_m(el) -> str:
    rows = []
    for t, child in _children(el):
        if t == "mr":
            cells = [_process(c) for tt, c in _children(child) if tt == "e"]
            rows.append("&".join(cells))
    return "\\begin{matrix}" + "\\\\".join(rows) + "\\end{matrix}"


_HANDLERS = {
    "r": _do_r, "sub": _do_sub, "sup": _do_sup, "f": _do_f,
    "d": _do_d, "nary": _do_nary, "func": _do_func,
    "rad": _do_rad, "bar": _do_bar, "acc": _do_acc,
    "groupChr": _do_groupchr, "eqArr": _do_eqarr,
    "limLow": _do_limlow, "limUpp": _do_limupp, "lim": _do_lim,
    "m": _do_m,
}


def omml_to_latex(omath_el) -> str:
    """m:oMath element → LaTeX string (``str(oMath2Latex(el))``)."""
    return _process(omath_el).replace("  ", " ")
