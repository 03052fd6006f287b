"""Form defaulting matrix — ported from /root/reference/form_test.go:25-116."""
from pyspark.sql import functions as F

from crawlspark.operators import forms

COLS = "form_id string, name string, type string, value string, " \
       "checked boolean, selected boolean, pos int, label string"


def resolve(spark, rows):
    df = spark.createDataFrame(rows, COLS)
    out = forms.resolve_values(df).collect()
    return {(r["form_id"], r["name"]):
            (r["value"], r["label"], r["n_available"]) for r in out}


def test_defaulting_matrix(spark):
    rows = [
        # input without label → value1, no label, 0 available
        ("f1", "name1", None, "value1", False, False, 0, None),
        # input with label
        ("f2", "name1", "text", "value1", False, False, 0, "label1"),
        # radio single without checked → first one
        ("f3", "name1", "radio", "value1", False, False, 0, None),
        # radio multiple without checked → first
        ("f4", "name1", "radio", "value1", False, False, 0, None),
        ("f4", "name1", "radio", "value2", False, False, 1, None),
        # radio multiple with checked → the checked one
        ("f5", "name1", "radio", "value1", False, False, 0, None),
        ("f5", "name1", "radio", "value2", True, False, 1, None),
        # radio without value → "on"
        ("f6", "name1", "radio", None, False, False, 0, None),
        # select single → first option
        ("f7", "name1", "select", "value1", False, False, 0, "label1"),
        # select with selected → that option + its label
        ("f8", "name1", "select", "value1", False, False, 0, "label1"),
        ("f8", "name1", "select", "value2", False, True, 1, "label2"),
        # select multiple without selected → first
        ("f9", "name1", "select", "value1", False, False, 0, "label1"),
        ("f9", "name1", "select", "value2", False, False, 1, "label2"),
        # checkbox unchecked → no current value, 1 available
        ("fa", "name1", "checkbox", "v", False, False, 0, None),
        # checkbox checked → value set
        ("fb", "name1", "checkbox", "v", True, False, 0, None),
        # MIXED-TYPE name group (round-3 VERDICT): checked element later
        # in doc order (rank 0) beats the earlier text default (rank 1)
        ("fc", "name1", "text", "typed", False, False, 0, None),
        ("fc", "name1", "checkbox", "boxed", True, False, 1, None),
        # mixed group with only rank-1/2 members → the min-pos rank-1
        # (unchecked checkbox never submits, text fallback wins)
        ("fd", "name1", "checkbox", "never", False, False, 0, None),
        ("fd", "name1", "text", "fallback", True, False, 1, None),
    ]
    got = resolve(spark, rows)
    assert got[("f1", "name1")] == ("value1", None, 0)
    assert got[("f2", "name1")] == ("value1", "label1", 0)
    assert got[("f3", "name1")] == ("value1", None, 1)
    assert got[("f4", "name1")] == ("value1", None, 2)
    assert got[("f5", "name1")] == ("value2", None, 2)
    assert got[("f6", "name1")] == ("on", None, 1)      # radio default "on"
    assert got[("f7", "name1")] == ("value1", "label1", 1)
    assert got[("f8", "name1")] == ("value2", "label2", 2)
    assert got[("f9", "name1")] == ("value1", "label1", 2)
    assert got[("fa", "name1")] == (None, None, 1)
    assert got[("fb", "name1")] == ("v", None, 1)
    # mixed groups: group Type = first element's type; chosen per-element
    assert got[("fc", "name1")] == ("boxed", None, 1)
    assert got[("fd", "name1")] == ("fallback", None, 1)


def test_submit_params_image_click(spark):
    # form.go:344-376: type=image emits name.x=0 / name.y=0 when clicked
    resolved = spark.createDataFrame(
        [("f1", "q", "text", "hello", 0, None),
         ("f1", "btn", "image", "go", 0, None),
         ("f1", "empty", "checkbox", None, 0, None)],
        "form_id string, name string, type string, value string, "
        "n_available int, label string")
    got = {(r["param"], r["pvalue"])
           for r in forms.submit_params(resolved, image_id="btn").collect()}
    assert got == {("q", "hello"), ("btn.x", "0"), ("btn.y", "0")}
    base = {(r["param"], r["pvalue"])
            for r in forms.submit_params(resolved).collect()}
    assert base == {("q", "hello")}  # null values + image skipped


def test_encoded_body_u5_reencode(spark):
    """U5 (form.go:378-401): values re-encoded into the session encoding
    (keeping the encodable prefix on unmappable chars) before
    Go-QueryEscape; keys sorted raw; space -> '+'."""
    df = spark.createDataFrame(
        [(1, "b", "a b"),          # space -> +
         (1, "a", "テスト"),        # SJIS 83 65 83 58 83 67
         (2, "q", "a&b=c"),        # reserved escaped
         (2, "r", "café"),         # é unmappable in SJIS -> prefix "caf"
         (3, "x", "emoji😀tail")],  # prefix stops at the emoji
        "form_id int, param string, pvalue string")
    got = {r["form_id"]: r["body"]
           for r in forms.encoded_body(df, "shift_jis").collect()}
    assert got[1] == "a=%83e%83X%83g&b=a+b"
    assert got[2] == "q=a%26b%3Dc&r=caf"
    assert got[3] == "x=emoji"
    # no session encoding -> UTF-8 bytes escaped
    got8 = {r["form_id"]: r["body"]
            for r in forms.encoded_body(df, None).collect()}
    assert got8[2] == "q=a%26b%3Dc&r=caf%C3%A9"
    assert got8[3] == "x=emoji%F0%9F%98%80tail"


def test_encoded_body_matches_pyref(spark):
    """Spark operator vs the independent pure-Python urlencoder over the
    full mixed-charset fixture, both encodings."""
    from crawlspark.functions import pyref
    rows = pyref.u5_form_fixture()
    df = spark.createDataFrame(rows,
                               "form_id int, param string, pvalue string")
    for codec in ("shift_jis", None):
        got = {r["form_id"]: r["body"]
               for r in forms.encoded_body(df, codec).collect()}
        want = dict(pyref.py_urlencode_forms(rows, codec))
        assert got == want


def test_resolve_submit_matches_dataframe_ops(spark):
    """The crawl loop's per-row resolver (resolve_submit) agrees with the
    reference-pinned DataFrame path (resolve_values -> submit_params) on
    every synthetic form."""
    from crawlspark import synth
    checked = 0
    for h in range(8):
        for k in range(0, 250):
            action, inputs = synth.gen_page_form(h, k, 200)
            if action is None:
                continue
            checked += 1
            rows = [("f", e["name"], e["type"], e["value"],
                     bool(e["checked"]), bool(e["selected"]), e["pos"],
                     None)
                    for e in inputs if e["name"] is not None]
            df = spark.createDataFrame(
                rows, "form_id string, name string, type string, "
                      "value string, checked boolean, selected boolean, "
                      "pos int, label string")
            want = {(r["param"], r["pvalue"]) for r in
                    forms.submit_params(
                        forms.resolve_values(df)).collect()}
            got = set(forms.resolve_submit(inputs))
            assert got == want, (h, k)
            if checked >= 12:
                return
    assert checked > 0


def _el(name, typ, value, pos, checked=False, selected=False):
    return {"name": name, "type": typ, "value": value, "pos": pos,
            "checked": checked, "selected": selected}


def test_resolve_submit_mixed_type_group_matches_oracle():
    """A mixed-type name group (text at pos 0 + checked checkbox at pos 1)
    resolves per-ELEMENT: the checked element (rank 0) beats the earlier
    text default (rank 1) — engine and oracle agree (round-2 ADVICE: the
    old group-wide rule took the min-pos element's type)."""
    from crawlspark.oracle import _form_submit_href
    inputs = [_el("q", "text", "typed", 0),
              _el("q", "checkbox", "boxed", 1, checked=True),
              _el("r", "checkbox", "never", 2),          # unchecked: dropped
              _el("r", "text", "fallback", 3)]
    got = dict(forms.resolve_submit(inputs))
    assert got == {"q": "boxed", "r": "fallback"}
    page = {"form_action": "/s", "form_inputs": inputs}
    assert _form_submit_href(page, None) == \
        forms.submit_href("/s", inputs, None) == "/s?q=boxed&r=fallback"


def test_resolve_values_mixed_group_matches_resolve_submit(spark):
    """The DataFrame path (resolve_values → submit_params) agrees with the
    per-row resolver AND the oracle twin on mixed-type name groups — the
    round-3 VERDICT divergence (the old resolve_values let the min-pos
    element's type set a group-wide rule)."""
    inputs = [_el("q", "text", "typed", 0),
              _el("q", "checkbox", "boxed", 1, checked=True),
              _el("r", "checkbox", "never", 2),
              _el("r", "text", "fallback", 3),
              _el("m", "hidden", "hid", 4),
              _el("m", "radio", "rad", 5, checked=True)]
    rows = [("f", e["name"], e["type"], e["value"], e["checked"],
             e["selected"], e["pos"], None) for e in inputs]
    df = spark.createDataFrame(
        rows, "form_id string, name string, type string, value string, "
              "checked boolean, selected boolean, pos int, label string")
    want = {(r["param"], r["pvalue"]) for r in
            forms.submit_params(forms.resolve_values(df)).collect()}
    assert want == set(forms.resolve_submit(inputs))
    assert want == {("q", "boxed"), ("r", "fallback"), ("m", "rad")}


def test_empty_form_action_submits_to_base():
    """action="" is a legal submit-to-current-URL form: both the engine
    resolver and the oracle produce a relative href that canonicalizes
    against the page base (HTML semantics), instead of the oracle skipping
    the form (round-2 ADVICE latent divergence)."""
    from crawlspark.oracle import _expand
    from crawlspark.urltools import canonicalize
    inputs = [_el("a", "text", "1", 0)]
    href = forms.submit_href("", inputs, None)
    assert href == "?a=1"
    assert canonicalize(href, "http://h.test/p/page") == \
        "http://h.test/p/page?a=1"
    page = {"form_action": "", "form_method": "get",
            "form_inputs": inputs, "links": []}
    kids = _expand(page, "http://h.test/p/page", 5.0, 7,
                   auto_submit_forms=True)
    assert [k["canon"] for k in kids] == ["http://h.test/p/page?a=1"]
