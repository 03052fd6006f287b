"""Nested extraction-spec compiler — the reference's ``Unmarshal`` struct-tag
tree (SURVEY.md §3.3), re-expressed for DataFrames.

The reference walks a Go struct with reflection, one field tag set per
field (/root/reference/unmarshal.go:196-248: ``find`` CSS selector,
``attr``, ``re`` single-capture, ``time`` Go layout, ``html`` flag,
``ignore`` literal), recursing into nested structs, slices and pointers
(unmarshal.go:135-155), with per-match text extraction + regex filtering
(unmarshal.go:95-130) and an exactly-one cardinality rule
(unmarshal.go:157-166). Here the same tree is a declarative dict spec:

    SPEC = {"type": "struct", "fields": {
        "novel_url": {"find": "a.favnovel_hover", "attr": "href"},
        "title":     {"find": "a.favnovel_hover"},
        "chapters":  {"find": "li.chap", "many": True,   # []Chapter
                      "type": "struct", "fields": {
                          "name": {"find": "b"},
                          "n":    {"find": "i", "type": "int"}}},
        "extra":     {"find": "em.x", "optional": True},  # *string
    }}

compiled in TWO phases:

  Phase A (Python, ONE ``mapInPandas`` pass over the ≤k fetched pages per
  round — never the corpus): build the DOM once per page and evaluate
  EVERY selector of the whole spec tree against it, emitting raw
  *strings* shaped like the spec (struct → struct, many → array,
  optional → nullable) plus a dotted-path error channel that mirrors
  ``UnmarshalFieldError`` formatting ("a.b: length(2) != 1",
  unmarshal.go:30-46). The reference's Chrome variant makes the same
  batching argument itself: collect all node ids in one pass, all texts
  in a second (chrome_unmarshal.go:235-277).

  Phase B (JVM Column expressions — whole-stage codegen, no Python):
  type conversion with the existing extract leaves — ``comma_int`` /
  ``comma_uint`` (Go ``%d`` with comma stripping), ``extract_number``
  (float), ``go_time`` (Go layout → JDK), ``ignore_zero`` — applied
  through nested ``F.struct`` / ``F.transform`` so arrays and structs
  stay columnar.

Scale shape: no shuffle, no per-row Python (one Arrow batch kernel), DOM
built once per page regardless of spec size; the typed phase is pure
codegen. At 100 TB the pass pipelines with the fetch/parse stage it
follows.

Semantics pinned against the reference's own vectors
(unmarshal_test.go:40-123 favnovel, 79-166 int/regex, 421-448
slice-of-struct, 474-502 html, 504-560 ignore) in tests/test_unmarshal.py:

  * per-match text: ``html`` → inner HTML, else ``attr`` → value with
    MISSING-ATTR SKIP, else concatenated text (unmarshal.go:95-113)
  * ``re``: exactly one capture group (validated at BUILD time —
    unmarshal.go:122-128 raises at run time; failing fast is strictly
    earlier), zero matches ⇒ skip the element (unmarshal.go:118-121)
  * slice (``many``) → every match, in document order; NO exactly-one
    rule and NO ignore (the reference's slice branch returns before
    both — unmarshal.go:135-145)
  * pointer (``optional``) → 0 matches ⇒ null, else exactly-one applies
    (unmarshal.go:147-155)
  * scalar → exactly one match or the row errs (unmarshal.go:157-159)
  * ``ignore`` literal → the type's ZERO value: "" / 0 / 0.0
    (unmarshal.go:161-166); ignore on ``time`` fields is rejected at
    build time (Go's zero time has no SQL analog — divergence documented
    here rather than silently mapped)
  * struct fields reject ``re``/``attr`` (unmarshal.go:197-203), a
    ``time`` tag is required for (and exclusive to) time fields
    (unmarshal.go:173-175, 184-186)
  * ``custom``: the named ``Unmarshaller`` escape hatch
    (unmarshal.go:15-17, 191-194) — a plain ``str -> str | None``
    callable applied per MATCH inside the batch kernel (None ⇒ skip the
    element, like a missing attr). It canonicalizes text before the
    declared type's conversion, which is what every reference custom
    unmarshaller does with its input string.

CSS subset (selectors the reference's own tests use, plus the engine's
nth arithmetic): ``tag``, ``*``, ``#id``, ``.class``, ``[attr]``,
``[attr=value]``, ``:nth-of-type(an+b)``, ``:nth-child(an+b)``,
descendant (space) and child (``>``) combinators, comma groups.
Anything else raises at build time — loudly, never a silent non-match.
"""

from __future__ import annotations

import re as _re
from html.parser import HTMLParser
from typing import Callable

import pandas as pd
from pyspark.sql import Column, DataFrame, functions as F
from pyspark.sql.types import (ArrayType, DataType, StringType, StructField,
                               StructType)

from .extract import (comma_int, comma_uint, extract_number, go_time,
                      validate_capture_re)

_VOID = {"area", "base", "br", "col", "embed", "hr", "img", "input", "link",
         "meta", "param", "source", "track", "wbr"}


# ---------------------------------------------------------------------------
# DOM (stdlib html.parser → node tree; shared doc-order index for dedup)
# ---------------------------------------------------------------------------

class _Node:
    __slots__ = ("tag", "attrs", "children", "parent", "order")

    def __init__(self, tag, attrs, parent, order):
        self.tag = tag
        self.attrs = attrs
        self.children = []          # _Node | str
        self.parent = parent
        self.order = order


class _DomParser(HTMLParser):
    def __init__(self):
        super().__init__(convert_charrefs=True)
        self.root = _Node(None, {}, None, 0)
        self._stack = [self.root]
        self._n = 0

    def handle_starttag(self, tag, attrs):
        self._n += 1
        node = _Node(tag, dict(attrs), self._stack[-1], self._n)
        self._stack[-1].children.append(node)
        if tag not in _VOID:
            self._stack.append(node)

    def handle_startendtag(self, tag, attrs):
        self._n += 1
        self._stack[-1].children.append(
            _Node(tag, dict(attrs), self._stack[-1], self._n))

    def handle_endtag(self, tag):
        # pop to the nearest matching open tag; unmatched end tags are
        # ignored (errors-as-data: wild HTML must never raise)
        for i in range(len(self._stack) - 1, 0, -1):
            if self._stack[i].tag == tag:
                del self._stack[i:]
                return

    def handle_data(self, data):
        self._stack[-1].children.append(data)


def build_dom(text: str) -> _Node:
    p = _DomParser()
    try:
        p.feed(text)
        p.close()
    except Exception:
        pass
    return p.root


def node_text(node: _Node) -> str:
    """goquery ``.Text()``: concatenated character data of the subtree."""
    out = []
    stack = [node]
    while stack:
        n = stack.pop()
        for c in reversed(n.children):
            if isinstance(c, str):
                out.append(c)
            else:
                stack.append(c)
    return "".join(out)


def _esc_attr(v: str) -> str:
    return v.replace("&", "&amp;").replace('"', "&quot;")


def _esc_text(v: str) -> str:
    return v.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _serialize(n) -> str:
    if isinstance(n, str):
        return _esc_text(n)
    attrs = "".join(f' {k}="{_esc_attr(v if v is not None else "")}"'
                    for k, v in n.attrs.items())
    inner = "".join(_serialize(c) for c in n.children)
    if n.tag in _VOID and not n.children:
        return f"<{n.tag}{attrs}/>"
    return f"<{n.tag}{attrs}>{inner}</{n.tag}>"


def inner_html(node: _Node) -> str:
    """goquery ``.Html()``: the subtree re-serialized (net/html does the
    same — the reference's Html() is a render, not a source byte span)."""
    return "".join(_serialize(c) for c in node.children)


# ---------------------------------------------------------------------------
# CSS subset
# ---------------------------------------------------------------------------

_NTH_RE = _re.compile(r"^\s*(odd|even|[+-]?\d+|([+-]?\d*)n\s*([+-]\s*\d+)?)"
                      r"\s*$", _re.I)


def _parse_anb(arg: str) -> tuple[int, int]:
    m = _NTH_RE.match(arg)
    if not m:
        raise ValueError(f"unsupported :nth argument {arg!r}")
    s = m.group(1).lower()
    if s == "odd":
        return 2, 1
    if s == "even":
        return 2, 0
    if "n" not in s:
        return 0, int(s)
    a_s = m.group(2)
    a = 1 if a_s in ("", "+") else -1 if a_s == "-" else int(a_s)
    b = int(m.group(3).replace(" ", "")) if m.group(3) else 0
    return a, b


_COMPOUND_TOKEN = _re.compile(
    r"(?P<tag>^[a-zA-Z][\w-]*|^\*)"
    r"|\.(?P<cls>[\w-]+)"
    r"|\#(?P<id>[\w-]+)"
    r"|\[(?P<attr>[\w-]+)(?:=(?P<q>[\"']?)(?P<val>[^\]\"']*)(?P=q))?\]"
    r"|:(?P<pseudo>nth-of-type|nth-child)\((?P<anb>[^)]*)\)")


class _Compound:
    __slots__ = ("tag", "id", "classes", "attrs", "nth")

    def __init__(self, src: str):
        self.tag = None
        self.id = None
        self.classes = []
        self.attrs = []               # (name, value-or-None)
        self.nth = []                 # (kind, a, b)
        pos = 0
        while pos < len(src):
            m = _COMPOUND_TOKEN.match(src, pos)
            if not m or m.end() == pos:
                raise ValueError(f"unsupported CSS syntax at {src[pos:]!r} "
                                 f"in compound {src!r}")
            if m.group("tag"):
                self.tag = None if m.group("tag") == "*" \
                    else m.group("tag").lower()
            elif m.group("cls"):
                self.classes.append(m.group("cls"))
            elif m.group("id"):
                self.id = m.group("id")
            elif m.group("attr"):
                self.attrs.append((m.group("attr").lower(), m.group("val")))
            else:
                self.nth.append((m.group("pseudo").lower(),
                                 *_parse_anb(m.group("anb"))))
            pos = m.end()

    def matches(self, node: _Node) -> bool:
        if node.tag is None:
            return False
        if self.tag is not None and node.tag != self.tag:
            return False
        if self.id is not None and node.attrs.get("id") != self.id:
            return False
        if self.classes:
            have = (node.attrs.get("class") or "").split()
            if any(c not in have for c in self.classes):
                return False
        for name, val in self.attrs:
            got = node.attrs.get(name)
            if got is None or (val is not None and got != val):
                return False
        for kind, a, b in self.nth:
            sibs = [c for c in node.parent.children
                    if isinstance(c, _Node)] if node.parent else [node]
            if kind == "nth-of-type":
                sibs = [c for c in sibs if c.tag == node.tag]
            idx = sibs.index(node) + 1          # 1-based
            if a == 0:
                if idx != b:
                    return False
            elif (idx - b) % a != 0 or (idx - b) // a < 0:
                return False
        return True


class _Selector:
    """One comma-group member: compounds joined by combinators."""
    __slots__ = ("steps",)

    def __init__(self, src: str):
        # normalize child combinator spacing, then split on whitespace
        parts = _re.sub(r"\s*>\s*", " > ", src.strip()).split()
        self.steps = []               # (combinator ''|'>'|' ', _Compound)
        comb = " "
        for p in parts:
            if p == ">":
                comb = ">"
                continue
            self.steps.append((comb, _Compound(p)))
            comb = " "
        if not self.steps:
            raise ValueError(f"empty selector in {src!r}")

    def matches(self, node: _Node) -> bool:
        def walk(n: _Node, i: int) -> bool:
            comb, comp = self.steps[i]
            if not comp.matches(n):
                return False
            if i == 0:
                return True
            prev_comb = self.steps[i][0]
            anc = n.parent
            if prev_comb == ">":
                return anc is not None and anc.tag is not None \
                    and walk(anc, i - 1)
            while anc is not None and anc.tag is not None:
                if walk(anc, i - 1):
                    return True
                anc = anc.parent
            return False
        return walk(node, len(self.steps) - 1)


class _CompiledSelector:
    __slots__ = ("groups", "src")

    def __init__(self, src: str):
        self.src = src
        self.groups = [_Selector(s) for s in src.split(",")]

    def find(self, roots: list[_Node]) -> list[_Node]:
        """Descendants of any root matching any group — document order,
        deduped (goquery Find semantics over a multi-node selection)."""
        seen = set()
        out = []
        for root in roots:
            stack = list(reversed([c for c in root.children
                                   if isinstance(c, _Node)]))
            while stack:
                n = stack.pop()
                if id(n) not in seen and any(g.matches(n)
                                             for g in self.groups):
                    seen.add(id(n))
                    out.append(n)
                stack.extend(reversed([c for c in n.children
                                       if isinstance(c, _Node)]))
        out.sort(key=lambda n: n.order)
        return out


# ---------------------------------------------------------------------------
# spec validation + compile
# ---------------------------------------------------------------------------

_LEAF_TYPES = {"string", "int", "uint", "float", "time"}
_SPEC_KEYS = {"find", "attr", "re", "time", "html", "ignore", "type",
              "fields", "many", "optional", "custom"}


class _CSpec:
    __slots__ = ("find", "attr", "re", "time", "html", "ignore", "type",
                 "fields", "many", "optional", "custom")


def _compile(spec: dict, path: str) -> _CSpec:
    unknown = set(spec) - _SPEC_KEYS
    if unknown:
        raise ValueError(f"{path or '<root>'}: unknown spec keys {unknown}")
    c = _CSpec()
    c.find = _CompiledSelector(spec["find"]) if spec.get("find") else None
    c.attr = spec.get("attr") or None
    c.re = spec.get("re") or None
    c.time = spec.get("time") or None
    c.html = bool(spec.get("html"))
    c.ignore = spec.get("ignore") or None
    c.many = bool(spec.get("many"))
    c.optional = bool(spec.get("optional"))
    c.custom = spec.get("custom")
    c.type = spec.get("type", "struct" if "fields" in spec else "string")
    if c.many and c.optional:
        raise ValueError(f"{path}: many and optional are exclusive "
                         "(a slice is already empty-able)")
    if c.re is not None:
        validate_capture_re(c.re)     # build-time (unmarshal.go:122-128)
    if c.custom is not None and not callable(c.custom):
        raise ValueError(f"{path}: custom must be callable (str -> str)")
    if c.type == "struct":
        if "fields" not in spec:
            raise ValueError(f"{path}: struct spec needs fields")
        if c.re is not None:          # unmarshal.go:197-203
            raise ValueError(f"{path}: `re` tag must be empty for struct")
        if c.attr is not None:
            raise ValueError(f"{path}: `attr` tag must be empty for struct")
        if c.time is not None:
            raise ValueError(f"{path}: `time` tag must be empty for struct")
        c.fields = {name: _compile(f, f"{path}.{name}" if path else name)
                    for name, f in spec["fields"].items()}
    else:
        if c.type not in _LEAF_TYPES:
            raise ValueError(f"{path}: unknown type {c.type!r}")
        if "fields" in spec:
            raise ValueError(f"{path}: fields only valid for struct")
        c.fields = None
        if c.type == "time" and c.time is None:
            raise ValueError(f"{path}: time.Time: time tag is required")
        if c.type != "time" and c.time is not None:
            raise ValueError(f"{path}: `time` tag must be empty unless "
                             "time.Time")
        if c.type == "time" and c.ignore is not None:
            raise ValueError(f"{path}: ignore is not supported for time "
                             "fields (Go's zero time has no SQL analog)")
    return c


def raw_schema(spec: _CSpec) -> DataType:
    """Phase-A schema: strings at the leaves, spec shape preserved."""
    if spec.type == "struct":
        inner: DataType = StructType([
            StructField(n, raw_schema(f)) for n, f in spec.fields.items()])
    else:
        inner = StringType()
    return ArrayType(inner) if spec.many else inner


# ---------------------------------------------------------------------------
# phase A: raw extraction kernel
# ---------------------------------------------------------------------------

class _FieldError(Exception):
    def __init__(self, path: str, msg: str):
        super().__init__(f"{path}: {msg}" if path else msg)


def _pairs(nodes: list[_Node], spec: _CSpec, path: str):
    """(node, text) per match after html/attr/custom/re — the reference's
    []pair loop (unmarshal.go:90-133)."""
    out = []
    regex = _re.compile(spec.re) if spec.re is not None else None
    for n in nodes:
        if spec.html:
            s = inner_html(n)
        elif spec.attr is not None:
            s = n.attrs.get(spec.attr)
            if s is None:
                continue              # missing attr ⇒ skip
        else:
            s = node_text(n)
        if spec.custom is not None:
            s = spec.custom(s)
            if s is None:
                continue              # custom skip channel
        if regex is not None:
            m = regex.search(s)
            if m is None:
                continue              # no match ⇒ skip
            s = m.group(1)
        out.append((n, s))
    return out


def _extract(roots: list[_Node], spec: _CSpec, path: str):
    nodes = spec.find.find(roots) if spec.find is not None else list(roots)
    if spec.type == "struct" and not spec.many and not spec.optional:
        # struct scalars: exactly-one FIRST, then per-field recursion
        if len(nodes) != 1:
            raise _FieldError(path, f"length({len(nodes)}) != 1")
        return _extract_struct(nodes[0], spec, path)

    if spec.type == "struct":
        if spec.many:
            return [_extract_struct(n, spec, f"{path}#{i}")
                    for i, n in enumerate(nodes)]
        if not nodes:                 # optional struct
            return None
        if len(nodes) != 1:
            raise _FieldError(path, f"length({len(nodes)}) != 1")
        return _extract_struct(nodes[0], spec, path)

    pairs = _pairs(nodes, spec, path)
    if spec.many:
        return [s for _, s in pairs]
    if spec.optional and not pairs:
        return None
    if len(pairs) != 1:
        raise _FieldError(path, f"length({len(pairs)}) != 1")
    return pairs[0][1]


def _extract_struct(node: _Node, spec: _CSpec, path: str):
    out = {}
    for name, fspec in spec.fields.items():
        fpath = f"{path}.{name}" if path else name
        out[name] = _extract([node], fspec, fpath)
    return out


def extract_raw(html: str, spec: _CSpec):
    """One page → (raw value, error string|None). Never raises: structural
    violations surface in the dotted-path error channel, mirroring
    UnmarshalFieldError's "a.b: <err>" format."""
    root = build_dom(html)
    try:
        return _extract([root], spec, ""), None
    except _FieldError as e:
        return None, str(e)


# ---------------------------------------------------------------------------
# phase B: typed Column tree (pure codegen)
# ---------------------------------------------------------------------------

def _ignore_guard(c: Column, spec: _CSpec, zero) -> Column:
    if spec.ignore is None:
        return c
    return F.when(c == F.lit(spec.ignore), F.lit(zero)).otherwise(c)


def _typed_leaf(c: Column, spec: _CSpec) -> Column:
    t = spec.type
    if t == "string":
        return _ignore_guard(c, spec, "")
    if t == "int":
        return comma_int(_ignore_guard(c, spec, "0"))
    if t == "uint":
        return comma_uint(_ignore_guard(c, spec, "0"))
    if t == "float":
        return extract_number(_ignore_guard(c, spec, "0"))
    if t == "time":
        return go_time(c, spec.time)
    raise AssertionError(t)


def _typed(c: Column, spec: _CSpec) -> Column:
    if spec.many:
        elem = _scalar_copy(spec)
        return F.transform(c, lambda x: _typed(x, elem))
    if spec.type == "struct":
        return F.when(c.isNotNull(), F.struct(*[
            _typed(c.getField(n), f).alias(n)
            for n, f in spec.fields.items()]))
    return _typed_leaf(c, spec)


def _scalar_copy(spec: _CSpec) -> _CSpec:
    e = _CSpec()
    for s in _CSpec.__slots__:
        setattr(e, s, getattr(spec, s))
    e.many = False
    # slice elements never see ignore (the reference's slice branch
    # returns before the ignore check — unmarshal.go:135-145 vs 161-166)
    e.ignore = None
    return e


# ---------------------------------------------------------------------------
# public API
# ---------------------------------------------------------------------------

def compile_spec(spec: dict) -> _CSpec:
    """Validate + compile a spec tree. Raises ValueError at BUILD time for
    anything the reference rejects at run time (bad `re`, struct with
    attr/re, time tag misuse) and for unsupported CSS syntax."""
    return _compile(spec, "")


def unmarshal_spec(df: DataFrame, spec: dict, body_col: str = "text",
                   out_col: str = "data",
                   err_col: str = "unmarshal_err") -> DataFrame:
    """Apply a compiled extraction spec to a DataFrame of decoded HTML.

    Returns the input columns (body dropped) + ``out_col`` (typed nested
    struct per the spec) + ``err_col`` (dotted-path structural error or
    null). One vectorized kernel pass; typing is pure Column codegen."""
    cspec = compile_spec(spec)
    rschema = raw_schema(cspec)
    keep = [f for f in df.schema.fields if f.name != body_col]
    keep_names = [f.name for f in keep]
    mid_schema = StructType(keep + [StructField("_raw", rschema),
                                    StructField(err_col, StringType())])

    def run(batches):
        for pdf in batches:
            vals, errs = [], []
            for html in pdf[body_col]:
                v, e = extract_raw("" if html is None else html, cspec)
                vals.append(v)
                errs.append(e)
            out = pdf[keep_names].copy()
            out["_raw"] = vals
            out[err_col] = errs
            yield out

    raw = df.mapInPandas(run, mid_schema)
    return (raw.withColumn(out_col, _typed(F.col("_raw"), cspec))
            .drop("_raw"))
