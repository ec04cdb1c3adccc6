"""Document → relational extraction operators (SURVEY.md §2.2, P1–P3 + G2).

The reference projects semi-structured documents (HTML) into columns via 14
absolute XPath expressions (pet_scraper.py:97-112) and fans each search page
out into ≤12 link rows (link_scraper.py:100-113). Spark-first restatement:
the built-in ``xpath_string`` / ``xpath`` SQL functions (JVM-side, no Python
UDF) over XML documents; one ``posexplode`` per page for the link fan-out.

Live HTML fetching (S1/S2) is non-deterministic and out of correctness scope
(SURVEY.md §7.3.6); see :mod:`..sources.fetch` for the fetch-UDF shape.

Scale: both operators are narrow per-row projections — no shuffle; they
pipeline inside the scan stage at any data size.
"""

from __future__ import annotations

from collections.abc import Mapping

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def xpath_columns(
    df: DataFrame,
    xml_col: str,
    xpaths: Mapping[str, str],
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """P1/P2 — project one column per XPath, first match, '' on miss
    (the reference's ``get_text`` contract, pet_scraper.py:135-161)."""
    cols: list[Column] = [F.col(c) for c in keep]
    for alias, xp in xpaths.items():
        cols.append(F.xpath_string(F.col(xml_col), F.lit(xp)).alias(alias))
    return df.select(*cols)


def explode_links(
    df: DataFrame,
    xml_col: str,
    href_xpath: str,
    keep: tuple[str, ...] = (),
    slot_col: str = "slot",
    href_col: str = "href",
) -> DataFrame:
    """P3/G2 — one row per extracted href, slot-numbered (1-based like the
    reference's 12 fixed XPath slots, link_scraper.py:100-113); empty slots
    dropped after position assignment (link_scraper.py:115-145 skips
    empties)."""
    exploded = df.select(
        *[F.col(c) for c in keep],
        F.posexplode(F.xpath(F.col(xml_col), F.lit(href_xpath))).alias("__pos", href_col),
    )
    return (
        exploded.filter(F.length(F.col(href_col)) > 0)
        .withColumn(slot_col, F.col("__pos") + 1)
        .drop("__pos")
    )


def explode_links_fast(
    df: DataFrame,
    xml_col: str,
    keep: tuple[str, ...] = (),
    slot_col: str = "slot",
    href_col: str = "href",
    href_pattern: str = r'<a href="([^"]*)"',
) -> DataFrame:
    """P3/G2 fast path — identical contract to :func:`explode_links` (every
    ``<a href>`` in document order, 1-based slot numbers assigned BEFORE
    empty slots are dropped) but via ONE ``regexp_extract_all`` pass per
    document instead of a per-row XPath DOM parse. The ``[^"]*`` capture
    keeps empty hrefs in the array so slot positions match the DOM walk
    exactly. ~1 ms/doc DOM cost drops to a linear regex scan; use this in
    hot paths, keep the xpath variant where arbitrary XPath is the point.

    Restriction vs xpath: matches ``<a href="...">`` anywhere in the
    document (no path anchoring) — equivalent whenever links live at one
    level, as in the reference's search pages (link_scraper.py:100-113)."""
    hrefs = F.regexp_extract_all(F.col(xml_col), F.lit(href_pattern), F.lit(1))
    exploded = df.select(
        *[F.col(c) for c in keep],
        F.posexplode(hrefs).alias("__pos", href_col),
    )
    return (
        exploded.filter(F.length(F.col(href_col)) > 0)
        .withColumn(slot_col, F.col("__pos") + 1)
        .drop("__pos")
    )


def regex_field_columns(
    df: DataFrame,
    xml_col: str,
    fields: Mapping[str, str],
    keep: tuple[str, ...] = (),
) -> DataFrame:
    """P1 fast path — first-match leaf-tag text via one JVM
    ``regexp_extract`` per column: for flat documents (no nested or
    attributed tags of the same name) this is exactly ``xpath_string``'s
    first-match-or-'' contract (pet_scraper.py:135-161) without the DOM
    parse. ``fields`` maps alias → tag name."""
    cols: list[Column] = [F.col(c) for c in keep]
    for alias, tag in fields.items():
        pattern = rf"<{tag}>([^<]*)</{tag}>"
        cols.append(
            F.regexp_extract(F.col(xml_col), pattern, 1).alias(alias)
        )
    return df.select(*cols)
