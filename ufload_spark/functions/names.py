"""Name-derivation scalar functions (SURVEY §2.8, OP-FN-1..5).

These are the reference's pure client-side string functions, re-expressed as
Spark ``Column`` expressions so they run JVM-side inside whole-stage codegen —
no Python UDFs anywhere on this path. Semantics mirror:

- OP-FN-1 filename→db      : reference ufload/cli/main.py:67-82 (_file_to_db)
- OP-FN-2 db→instance      : reference ufload/db.py:623-634 (_db_to_instance)
- OP-FN-3 instance→dir     : reference ufload/cloud.py:34-48 (instance_to_dir)
- OP-FN-5 password decrypt : reference ufload/cloud.py:22-31 (_decrypt)
- wildcard any-of match    : reference ufload/cloud.py:143-159
- version sort key         : reference ufload/cli/main.py:554,718
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column
from pyspark.sql import functions as F


def file_to_db(
    name: Column, prefix: str | None = None, nosuffix: bool = False
) -> Column:
    """Backup filename → database name (OP-FN-1).

    ``OCG_MM1_WA-20160831-220427-…`` → ``[pfx_]OCG_MM1_WA_20160831_2204``:
    token 0 is the instance, token 1 the date, token 2 a 6-char time
    truncated to HHMM. Mirrors the reference's LIVE branch structure
    (cli/main.py:67-82 — the None-return is commented out there): names
    that don't have a 6-char third token fall back to the filename minus
    its last 5 characters (the ``.dump`` extension), and ``nosuffix`` mode
    takes token 0 alone. Directory components are stripped first
    (``os.path.basename`` in the reference)."""
    base = F.element_at(F.split(name, "/"), -1)
    parts = F.split(base, "-")
    if nosuffix:
        db = parts.getItem(0)
    else:
        structured = (F.size(parts) >= 3) & (F.length(parts.getItem(2)) == 6)
        joined = F.concat_ws(
            "_",
            parts.getItem(0),
            parts.getItem(1),
            F.substring(parts.getItem(2), 1, 4),
        )
        # fn[:-5]: strip the 5-char '.dump' extension; shorter names → ''
        fallback = F.substring(base, 1, F.greatest(F.length(base) - 5, F.lit(0)))
        db = F.when(structured, joined).otherwise(fallback)
    if prefix:
        return F.concat(F.lit(prefix + "_"), db)
    return db


def db_to_instance(db: Column, prefix: str | None = None) -> Column:
    """Database name → instance name (OP-FN-2).

    Strips a leading ``<prefix>_`` if present, then a trailing
    ``_YYYYMMDD_HHMM`` timestamp suffix; names without the suffix (e.g. sync
    servers) pass through unchanged (reference db.py:623-634).
    """
    x = db
    if prefix:
        p = prefix + "_"
        x = F.when(db.startswith(p), F.substring(db, len(p) + 1, 2**30)).otherwise(db)
    return F.regexp_replace(x, "_[0-9]{8}_[0-9]{4}$", "")


def instance_to_dir(instance: Column) -> Column:
    """Instance name → cloud backup directory (OP-FN-3).

    Prefix/suffix dispatch chain mirroring reference cloud.py:34-48:
    ``*_OCA`` → OCA dir, ``OCB*`` → OCB, ``OCP*`` → OCP, ``OCG_*`` → OCG,
    otherwise NULL (unknown OC).
    """
    return (
        F.when(instance.endswith("_OCA"), F.lit("/UF_OCA/backups"))
        .when(instance.startswith("OCB"), F.lit("/UF_OCB/backups"))
        .when(instance.startswith("OCP"), F.lit("/UF_OCP/backups"))
        .when(instance.startswith("OCG_"), F.lit("/UF_OCG/backups"))
    )


def match_any_wildcard(name: Column, patterns: Sequence[str]) -> Column:
    """True if ANY pattern is a case-insensitive substring of ``name``;
    an empty pattern list matches everything (reference cloud.py:150-159,
    applied case-insensitively at cloud.py:193-200)."""
    if not patterns:
        return F.lit(True)
    low = F.lower(name)
    cond = F.lit(False)
    for p in patterns:
        cond = cond | low.contains(p.lower())
    return cond


def decrypt_password(enc: Column) -> Column:
    """Drop the first 4 characters, base64-decode the rest (OP-FN-5,
    reference cloud.py:22-31)."""
    return F.unbase64(F.substring(enc, 5, 2**30)).cast("string")


def version_key(name: Column, pattern: str = r"uf(.+?)\.patch\.zip") -> Column:
    """Natural version sort key (OP-SORT-2, reference cli/main.py:554):
    extract the version text, split on ``.``/``-``/``p``, cast each token to
    int → an int array that sorts by numeric version order."""
    ver = F.regexp_extract(name, pattern, 1)
    return F.transform(
        F.filter(F.split(ver, r"[.\-p]"), lambda x: F.length(x) > 0),
        lambda x: x.cast("int"),
    )
