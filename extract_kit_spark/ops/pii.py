"""PII redaction — the scrub pass a pretraining pipeline runs between
extraction and packing (reference has no PII stage; this follows the
published C4/RefinedWeb/CCNet practice of regex-level scrubbing for
emails, phone numbers and host addresses).

Design constraints, in order:

- **Pure expressions.** Every detector/redactor is a chain of
  `regexp_replace` / `regexp_count` on the text column — JVM-side,
  whole-stage-codegen, zero Python in the hot path. At 100 TB the
  scrub costs what the scan costs.
- **RE2-safe patterns.** No lookaround, no backreferences — so the
  DuckDB oracle runs the LITERAL same patterns and the redaction
  semantics (not just row counts) are pinned cross-engine, and the
  same patterns would run unchanged in RE2-based scrubbers.
- **Deterministic masks.** Each PII class is replaced by a fixed
  token (``<EMAIL>``, ``<PHONE>``, ``<IP>``), never hashed or
  salted — re-running the scrub is idempotent: scrub(scrub(x)) ==
  scrub(x) (property-tested).

Pattern notes (the false-positive trade is documented, not hidden):

- emails: conservative RFC-lite ``local@domain.tld``; no quoted
  locals or IP-literal domains (vanishingly rare in web text, and the
  cost of a miss is a leaked address — so the domain must end in an
  alpha TLD of ≥2 chars).
- phones: international/NANP-ish shapes ``+1 555 123 4567``,
  ``(555) 123-4567``, ``555-123-4567`` — between 7 and 15 digits
  total per ITU E.164, anchored on separators so order ids and
  timestamps don't match.
- IPv4: four dotted octets with word boundaries; values aren't
  range-checked (999.1.1.1 redacts — acceptable: such strings carry
  no utility and range checks need lookahead RE2 lacks).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

EMAIL_RE = r"[A-Za-z0-9._%+\-]+@[A-Za-z0-9.\-]+\.[A-Za-z]{2,}"
PHONE_RE = (r"(\+?[0-9]{1,3}[ .\-])?(\([0-9]{2,4}\)[ .\-]?|[0-9]{2,4}"
            r"[ .\-])[0-9]{3,4}[ .\-][0-9]{3,4}")
IPV4_RE = r"\b([0-9]{1,3}\.){3}[0-9]{1,3}\b"

EMAIL_MASK = "<EMAIL>"
PHONE_MASK = "<PHONE>"
IP_MASK = "<IP>"


def scrub_text(text: Column) -> Column:
    """The redacted text: emails, then IPv4 (before phones — a dotted
    quad's digit runs could otherwise half-match the phone shapes),
    then phones. Fixed masks keep the op idempotent."""
    t = F.regexp_replace(text, EMAIL_RE, EMAIL_MASK)
    t = F.regexp_replace(t, IPV4_RE, IP_MASK)
    return F.regexp_replace(t, PHONE_RE, PHONE_MASK)


def scrub(df: DataFrame, id_col: str = "doc_id",
          text_col: str = "text") -> DataFrame:
    """Per-doc scrub result: redacted text plus per-class match counts
    (counts come from the SAME patterns as the replacements, so
    ``n_emails`` is exactly the number of ``<EMAIL>`` masks inserted).
    Counts are computed on the same staged text as the corresponding
    replace (ips on the email-scrubbed text, phones on the ip-scrubbed
    text) so overlapping classes are attributed once, to the class
    that actually consumed the span."""
    t0 = F.col(text_col)
    t1 = F.regexp_replace(t0, EMAIL_RE, EMAIL_MASK)
    t2 = F.regexp_replace(t1, IPV4_RE, IP_MASK)
    t3 = F.regexp_replace(t2, PHONE_RE, PHONE_MASK)
    return df.select(
        F.col(id_col),
        t3.alias("clean_text"),
        F.regexp_count(t0, F.lit(EMAIL_RE)).cast("long")
         .alias("n_emails"),
        F.regexp_count(t1, F.lit(IPV4_RE)).cast("long").alias("n_ips"),
        F.regexp_count(t2, F.lit(PHONE_RE)).cast("long")
         .alias("n_phones"),
        (F.regexp_count(t0, F.lit(EMAIL_RE))
         + F.regexp_count(t1, F.lit(IPV4_RE))
         + F.regexp_count(t2, F.lit(PHONE_RE)) > 0).alias("has_pii"))
