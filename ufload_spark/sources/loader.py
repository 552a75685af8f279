"""Staged load → audit → atomic publish (OP-SNK-1, SURVEY §2.1/§4).

The reference restores into a staging database named ``<db>_<pid>``, runs
fixups, then atomically swaps it into place and drops the old one
(reference ufload/db.py:101-109,179-188) — the write-audit-publish pattern.
Here the same lifecycle is expressed over table directories:

1. **stage**: write the DataFrame as parquet under ``<target>.staging.<pid>``
2. **audit**: row count *observed during the staging write itself*
   (``df.observe`` — one scan of the source, no second pass) must equal the
   staged copy's parquet-footer count — nothing is visible to readers yet
3. **publish**: atomically rename staging → target (old data, if any, is
   moved aside first and deleted only after the swap succeeds)

All filesystem ops go through the Hadoop ``FileSystem`` API, so the code is
identical on local disk, HDFS, and object stores. Directory rename is atomic
on local/HDFS; on S3-like stores it is copy+delete — production deployments
layer a transactional table format (Delta/Iceberg) over the same
stage/audit/publish sequence, which this module documents as the swap-in
replacement.

Crash posture of the two-rename swap: a crash *between* the renames leaves
``target`` absent with the previous data parked in ``<target>.old.<suffix>``
(the reference's drop-then-rename, db.py:179-208, has the same window).
Recovery is built in: the next publish first restores the newest ``.old``
copy if ``target`` is absent, and ``.old`` dirs are swept only *after* a
successful publish — never up front, where they may be the only surviving
copy. For readers that must never observe an absent target at all,
:func:`publish_versioned` / :func:`read_current` close the window entirely
with a pointer-file commit (data dirs are immutable versions; the commit is
one atomic rename of a one-line pointer file).

Skip-if-unchanged (OP-STR-2): the reference memoizes the last-loaded dump
size in an ``about`` table (reference ufload/db.py:695-711) and skips the
reload when the source size is unchanged. :func:`should_reload` /
:func:`record_loaded` reproduce that memo over a one-row control parquet.
"""

from __future__ import annotations

import os
import shutil
import time
import uuid

from pyspark.sql import DataFrame, Observation, SparkSession
from pyspark.sql import functions as F

from ufload_spark.plans.registry import register
from ufload_spark.sources.tables import table

# Staging dirs younger than this are presumed to belong to a live concurrent
# publish and are left alone; older ones are crash debris. Directory mtimes
# tick while the writer streams files in, so any actively-written staging
# dir is far younger than this.
ORPHAN_MIN_AGE_S = 3600.0


class AuditError(RuntimeError):
    """Staged data failed its pre-publish audit; nothing was published."""


class ConcurrentPublishError(AuditError):
    """A second writer holds the publish lease for this target. The
    single-writer contract of the pointer publish is ENFORCED, not
    assumed (r8 verdict): the loser fails cleanly before writing
    anything, instead of silently last-winning the pointer swap. The
    reference analog is connection fencing before DDL (reference
    ufload/db.py:573-597: kill other sessions so exactly one writer
    proceeds); on a filesystem the fence is an atomic create-if-absent
    lease file."""


def _fs(spark: SparkSession, path: str):
    jvm = spark._jvm
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    return jpath.getFileSystem(spark._jsc.hadoopConfiguration()), jpath, jvm


def _glob(fs, jvm, pattern: str):
    statuses = fs.globStatus(jvm.org.apache.hadoop.fs.Path(pattern))
    return list(statuses) if statuses is not None else []


def _recover_old(fs, jvm, jtarget, target: str) -> None:
    """If a previous publish crashed between its two swap renames, ``target``
    is absent and the only surviving copy sits in ``<target>.old.<suffix>``.
    Restore the newest such copy instead of treating it as garbage."""
    if fs.exists(jtarget):
        return
    olds = _glob(fs, jvm, f"{target}.old.*")
    if not olds:
        return
    newest = max(olds, key=lambda st: st.getModificationTime())
    fs.rename(newest.getPath(), jtarget)


def _sweep_stale_staging(fs, jvm, target: str, *, min_age_s: float = ORPHAN_MIN_AGE_S) -> None:
    """Remove ``<target>.staging.*`` left by *crashed* runs. Only dirs older
    than ``min_age_s`` are touched: a fresh staging dir may belong to a live
    concurrent publish (each run's unique suffix keeps names disjoint, so age
    is the only signal needed to tell debris from in-flight work)."""
    now_ms = time.time() * 1000
    for st in _glob(fs, jvm, f"{target}.staging.*"):
        if now_ms - st.getModificationTime() >= min_age_s * 1000:
            fs.delete(st.getPath(), True)


def _sweep_old(fs, jvm, target: str) -> None:
    """Remove every ``<target>.old.*``. Called only after a successful
    publish, when ``target`` holds the new data and the old copies are
    genuinely disposable — never up front (ADVICE r2: an up-front sweep
    deletes the crash-recovery copy before anything replaced it)."""
    for st in _glob(fs, jvm, f"{target}.old.*"):
        fs.delete(st.getPath(), True)


def stage_and_publish(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    *,
    expected_rows: int | None = None,
    partitions: int | None = None,
) -> int:
    """Write ``df`` to a staging dir, audit it, publish to ``target`` via
    directory swap. Returns the audited row count.

    The row count is **observed during the staging write** (one scan of the
    source) and audited against the staged copy's parquet-footer count; pass
    ``expected_rows`` only when the caller has an independent expectation —
    there is no internal pre-count.

    Failure posture: on any audit/write failure the staging dir is removed
    and ``target`` is untouched (reference ufload/db.py:202-208 drops the
    staging DB the same way); if the publish rename itself fails after the
    old data was moved aside, the old dir is renamed back. Old copies are
    swept only after the new publish succeeds; if a previous run crashed
    mid-swap, its ``.old`` copy is restored to ``target`` first.
    """
    # unique per-invocation suffix: a reused pid (the reference's choice,
    # db.py:101) collides with leftovers from a crashed earlier run
    suffix = f"{int(time.time() * 1000):x}.{uuid.uuid4().hex[:8]}"
    staging = f"{target}.staging.{suffix}"
    fs, jtarget, jvm = _fs(spark, target)
    _recover_old(fs, jvm, jtarget, target)
    _sweep_stale_staging(fs, jvm, target)
    jstaging = jvm.org.apache.hadoop.fs.Path(staging)
    old = jvm.org.apache.hadoop.fs.Path(f"{target}.old.{suffix}")
    moved_aside = False
    try:
        w = df.repartition(partitions) if partitions else df
        obs = Observation(f"stage_audit_{suffix}")
        w.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
            "overwrite"
        ).parquet(staging)
        written = obs.get["rows"]
        if written == 0:
            raise AuditError(f"staged {staging} is empty")
        # footer-metadata count of the staged copy — cheap (no column reads),
        # and proves the bytes on disk agree with what the scan produced
        audited = spark.read.parquet(staging).count()
        if audited != written:
            raise AuditError(
                f"staged {staging} has {audited} rows but the write observed "
                f"{written} — staged copy is corrupt"
            )
        if expected_rows is not None and audited != expected_rows:
            raise AuditError(
                f"staged {staging} has {audited} rows, expected {expected_rows}"
            )
        if fs.exists(jtarget):
            if not fs.rename(jtarget, old):
                raise AuditError(f"could not move aside {target}")
            moved_aside = True
        if not fs.rename(jstaging, jtarget):
            raise AuditError(f"could not publish {staging} -> {target}")
        moved_aside = False  # published; old copies are now disposable
        _sweep_old(fs, jvm, target)
        return audited
    except Exception:
        # roll the old data back if we got as far as moving it aside
        if moved_aside and not fs.exists(jtarget):
            fs.rename(old, jtarget)
        if fs.exists(jstaging):
            fs.delete(jstaging, True)
        raise


# --- pointer-file publish: no reader-visible gap, ever ---------------------


def _pointer_path(target: str) -> str:
    return f"{target}.current"


def _lease_path(target: str) -> str:
    return f"{target}.lease"


#: a lease older than this is presumed crash debris (a publish at any SF is
#: seconds; a holder that has held the lease for an hour is dead) and may be
#: broken by the next writer. Same liveness discipline as ORPHAN_MIN_AGE_S.
LEASE_TTL_S = 3600.0


def _sweep_stale_captures(fs, jvm, target: str, *, min_age_s: float = LEASE_TTL_S) -> None:
    """Remove ``<lease>.cap.*`` orphans left by a breaker/releaser that
    crashed between capture and delete (r10 ADVICE): the TTL discipline
    covers only the ``.lease`` path itself, so these would leak forever.
    Age-gated like the staging sweep — a fresh capture may belong to a
    live breaker mid-break."""
    for st in _glob(fs, jvm, f"{_lease_path(target)}.cap.*"):
        if time.time() * 1000 - st.getModificationTime() >= min_age_s * 1000:
            try:
                fs.delete(st.getPath(), False)
            except Exception:
                pass  # another sweeper won the race; nothing to leak


def _read_small(fs, jvm, jpath) -> str:
    stream = fs.open(jpath)
    try:
        return jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()


def _acquire_lease(fs, jvm, target: str, *, ttl_s: float) -> str:
    """Take the publish lease for ``target`` via atomic create-if-absent
    (``FileSystem.create(path, overwrite=false)`` — exactly one of any
    number of racing writers gets the create; the rest raise). A stale
    lease (older than ``ttl_s`` — its holder crashed mid-publish) is
    broken with one delete + one more create attempt; losing THAT create
    too means a live competitor re-acquired first, and we fail cleanly.
    Returns the fencing token written into the lease."""
    jlease = jvm.org.apache.hadoop.fs.Path(_lease_path(target))
    token = f"{uuid.uuid4().hex}.{int(time.time() * 1000)}"
    _sweep_stale_captures(fs, jvm, target)

    def try_create() -> bool:
        try:
            out = fs.create(jlease, False)
        except Exception:
            return False
        try:
            out.write(bytearray(token.encode("utf-8")))
        finally:
            out.close()
        return True

    if try_create():
        return token
    stale_tok = None
    try:
        age_ms = time.time() * 1000 - fs.getFileStatus(jlease).getModificationTime()
        stale_tok = _read_small(fs, jvm, jlease)
    except Exception:
        age_ms = 0.0  # holder released between our create and stat: retry
    if age_ms >= ttl_s * 1000 or not fs.exists(jlease):
        # break via atomic CAPTURE, not delete (r9 ADVICE): rename is
        # atomic and refuses a missing source, so of N breakers that all
        # passed the age check exactly ONE captures the stale file — the
        # losers fall through to the create race below instead of
        # deleting the winner's freshly created lease.
        cap = _capture_lease(fs, jvm, target, token)
        if cap is not None:
            cap_tok = None
            try:
                cap_tok = _read_small(fs, jvm, cap)
            except Exception:
                pass
            if stale_tok is not None and cap_tok == stale_tok:
                fs.delete(cap, False)  # the stale lease we measured: break it
            else:
                # r10 ADVICE: the captured file is NOT the lease the age
                # check measured — the stale holder released and a LIVE
                # writer re-created it inside the stat→capture window.
                # Give it back instead of fencing a live holder. rename
                # refuses an existing destination: if a third writer
                # claimed the path meanwhile, drop the captured copy and
                # its displaced owner fails CLOSED at _check_lease
                # (spurious abort, never a clobber — the documented
                # residual of the check-then-act window).
                try:
                    if not fs.rename(cap, jlease):
                        fs.delete(cap, False)
                except Exception:
                    fs.delete(cap, False)
        if try_create():
            return token
    raise ConcurrentPublishError(
        f"another writer holds the publish lease {_lease_path(target)}; "
        "refusing to race the pointer swap (single-writer contract)"
    )


def _capture_lease(fs, jvm, target: str, tag: str):
    """Atomically take custody of whatever lease file currently exists by
    renaming it to a caller-unique path (``FileSystem.rename`` — atomic,
    fails if the source is gone or the destination exists, so exactly one
    of any number of racing capturers wins). Returns the captured Path,
    or None if there was nothing to capture / someone else won."""
    jlease = jvm.org.apache.hadoop.fs.Path(_lease_path(target))
    dst = jvm.org.apache.hadoop.fs.Path(
        f"{_lease_path(target)}.cap.{tag[:8]}.{uuid.uuid4().hex[:8]}"
    )
    try:
        if fs.rename(jlease, dst):
            return dst
    except Exception:
        pass
    return None


def _release_lease(fs, jvm, target: str, token: str) -> None:
    """Drop the lease iff we still own it (a breaker may have fenced us).
    Token-checked ATOMICALLY (r9 ADVICE): capture the lease file by
    rename, inspect the captured copy, and either delete it (ours — clean
    release) or rename it back (a competitor's live lease we must not
    destroy; if a third writer created a new lease in the window, the
    rename-back refuses the existing destination and the captured copy is
    dropped — the displaced competitor's own pre-commit ``_check_lease``
    then fails CLOSED with a spurious abort, never a clobber). The old
    exists/read/delete form could delete a competitor's freshly created
    lease after a stale-break race."""
    try:
        cap = _capture_lease(fs, jvm, target, token)
        if cap is None:
            return  # already released or broken
        if _read_small(fs, jvm, cap) == token:
            fs.delete(cap, False)
            return
        jlease = jvm.org.apache.hadoop.fs.Path(_lease_path(target))
        if not fs.rename(cap, jlease):
            fs.delete(cap, False)
    except Exception:
        pass  # lease debris is TTL-swept by the next writer


def _check_lease(fs, jvm, target: str, token: str) -> None:
    """Fencing check immediately before the pointer swap: if the lease no
    longer carries OUR token, a competitor broke it as stale (we were
    presumed dead) — abort rather than clobber its commit."""
    jlease = jvm.org.apache.hadoop.fs.Path(_lease_path(target))
    try:
        held = fs.exists(jlease) and _read_small(fs, jvm, jlease) == token
    except Exception:
        held = False
    if not held:
        raise ConcurrentPublishError(
            f"publish lease for {target} was broken mid-publish (holder "
            "presumed dead); aborting before the pointer swap"
        )


def publish_versioned(
    spark: SparkSession,
    df: DataFrame,
    target: str,
    *,
    keep_versions: int = 1,
    lease_ttl_s: float = LEASE_TTL_S,
) -> int:
    """Publish ``df`` under ``target`` with a pointer-file commit: write an
    immutable version dir ``<target>.v.<suffix>``, audit it, then atomically
    swap a one-line pointer file ``<target>.current`` to name it. Readers
    (:func:`read_current`) resolve the pointer and read a complete version —
    there is **no instant at which the table is absent**, unlike the
    two-rename directory swap (whose crash window the reference's
    drop-then-rename, db.py:179-208, shares). A crash before the pointer
    rename leaves the previous version live; after it, the new one. Returns
    the audited row count.

    ``keep_versions`` older versions are retained after commit for
    time-travel-ish debugging; the rest are swept (current is always kept).

    Single-writer contract (r9): the whole version-write → audit →
    pointer-swap span runs under a lease file (``<target>.lease``,
    atomic create-if-absent; :func:`_acquire_lease`). A second concurrent
    publisher raises :class:`ConcurrentPublishError` BEFORE writing
    anything instead of silently last-winning the pointer; a crashed
    holder's lease is broken after :data:`LEASE_TTL_S`, and the breaker's
    fencing token check (:func:`_check_lease`) keeps a zombie holder from
    clobbering the breaker's commit. Enforced by
    ``test_concurrent_pointer_publish_single_writer``.

    Residual TOCTOU (r9 ADVICE, documented): ``_check_lease`` →
    ``_commit_pointer`` is check-then-act — a TTL-breaker that acquires
    AND commits inside that window can still be last-wins'd by the
    zombie's pointer swap. A plain filesystem offers atomic
    create-if-absent and rename but no compare-and-swap, so the window
    cannot be closed here; closing it needs a conditional put (S3
    If-Match, etcd txn) at the pointer itself. Every committed pointer
    still names a complete audited version — the race affects WHICH
    complete version wins, never pointer integrity. Break and release
    are rename-captured (:func:`_capture_lease`), so the breaker-break
    and release-after-fence races fail closed rather than deleting a
    competitor's live lease.
    """
    fs, _, jvm = _fs(spark, target)
    token = _acquire_lease(fs, jvm, target, ttl_s=lease_ttl_s)
    try:
        suffix = f"{int(time.time() * 1000):x}.{uuid.uuid4().hex[:8]}"
        version = f"{target}.v.{suffix}"
        jversion = jvm.org.apache.hadoop.fs.Path(version)
        try:
            obs = Observation(f"version_audit_{suffix}")
            df.observe(obs, F.count(F.lit(1)).alias("rows")).write.mode(
                "overwrite"
            ).parquet(version)
            written = obs.get["rows"]
            if written == 0:
                raise AuditError(f"staged version {version} is empty")
            audited = spark.read.parquet(version).count()
            if audited != written:
                raise AuditError(
                    f"version {version} has {audited} rows but the write observed "
                    f"{written}"
                )
            _check_lease(fs, jvm, target, token)
            _commit_pointer(spark, fs, jvm, target, os.path.basename(version))
        except Exception:
            if fs.exists(jversion):
                fs.delete(jversion, True)
            raise
        _sweep_versions(fs, jvm, target, keep=keep_versions)
        return audited
    finally:
        _release_lease(fs, jvm, target, token)


def _commit_log_path(target: str) -> str:
    return f"{target}.commits"


def _atomic_write(spark: SparkSession, fs, jvm, path: str, data: str) -> None:
    """Write ``data`` to ``path`` atomically: tmp file, then rename over the
    destination with ``Options.Rename.OVERWRITE`` (``FileContext.rename`` —
    the atomic clobbering form; plain ``FileSystem.rename`` refuses an
    existing destination, and a delete-then-rename would reopen an absence
    window). Readers see either the old contents or the new, never
    neither."""
    tmp = jvm.org.apache.hadoop.fs.Path(f"{path}.tmp.{uuid.uuid4().hex[:8]}")
    out = fs.create(tmp, True)
    try:
        out.write(bytearray(data.encode("utf-8")))
    finally:
        out.close()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fc = jvm.org.apache.hadoop.fs.FileContext.getFileContext(
        spark._jsc.hadoopConfiguration()
    )
    rename_opt = jvm.org.apache.hadoop.fs.Options.Rename
    overwrite = spark.sparkContext._gateway.new_array(rename_opt, 1)
    overwrite[0] = rename_opt.OVERWRITE
    try:
        fc.rename(tmp, jpath, overwrite)
    except Exception as e:
        fs.delete(tmp, False)
        raise AuditError(f"could not commit {path}: {e}") from e


def _read_commit_log(fs, jvm, target: str) -> list[str]:
    """Committed version names, oldest → newest (empty when no log)."""
    jlog = jvm.org.apache.hadoop.fs.Path(_commit_log_path(target))
    if not fs.exists(jlog):
        return []
    stream = fs.open(jlog)
    try:
        data = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return [line.strip() for line in data.splitlines() if line.strip()]


def _append_commit_log(
    spark: SparkSession, fs, jvm, target: str, version_name: str, prev: str | None
) -> None:
    """Durably record commit ORDER (ADVICE r4: directory mtime is
    write-completion time, not commit time — a slow writer can give an older
    commit a younger mtime, so history positions need their own record).
    Appends ``version_name`` to ``<target>.commits`` via the same atomic
    tmp+rename as the pointer. Self-healing: if the pre-commit current is
    missing from the log tail (its own publish crashed between pointer
    rename and log append), it is appended first, so one lost append never
    shifts later history positions. Entries whose version dirs are gone are
    trimmed, keeping the log bounded by retention."""
    log = _read_commit_log(fs, jvm, target)
    if prev is not None and (not log or log[-1] != prev):
        log.append(prev)
    log.append(version_name)
    existing = {st.getPath().getName() for st in _glob(fs, jvm, f"{target}.v.*")}
    log = [n for n in log if n in existing]
    _atomic_write(spark, fs, jvm, _commit_log_path(target), "\n".join(log) + "\n")


def _commit_pointer(spark: SparkSession, fs, jvm, target: str, version_name: str) -> None:
    """Atomically point ``<target>.current`` at ``version_name`` (the commit
    instant), then record the commit in the order log. A crash between the
    two leaves a committed-but-unlogged version; the next commit's
    self-heal (:func:`_append_commit_log`) backfills it."""
    prev = _read_pointer(fs, jvm, target)
    _atomic_write(spark, fs, jvm, _pointer_path(target), version_name)
    _append_commit_log(spark, fs, jvm, target, version_name, prev)


def _sweep_versions(fs, jvm, target: str, *, keep: int) -> None:
    """Retain the current version plus the ``keep`` most recent OTHER
    commits, by commit-log order (mtime only as a fallback for unlogged
    legacy dirs). Never-committed dirs (a publish that crashed before its
    pointer rename) rank last, so they are the first debris swept."""
    current = _read_pointer(fs, jvm, target)
    rank = {n: i for i, n in enumerate(_read_commit_log(fs, jvm, target))}
    versions = sorted(
        _glob(fs, jvm, f"{target}.v.*"),
        key=lambda st: (
            rank.get(st.getPath().getName(), -1),
            st.getModificationTime(),
        ),
        reverse=True,
    )
    survivors = 0
    for st in versions:
        name = st.getPath().getName()
        if name == current:
            continue
        if rank and name not in rank:
            # a log exists, so an unlogged dir is a publish that died before
            # its pointer rename: unreadable via history, delete outright
            # rather than letting debris occupy a retention slot. Age-gated
            # so a CONCURRENT publisher's just-written, not-yet-committed
            # version is never swept out from under its pointer rename
            # (same liveness posture as _scratch_unique)
            if time.time() * 1000 - st.getModificationTime() > 300_000:
                fs.delete(st.getPath(), True)
            continue
        if survivors < keep:
            survivors += 1
            continue
        fs.delete(st.getPath(), True)


def _read_pointer(fs, jvm, target: str) -> str | None:
    jpointer = jvm.org.apache.hadoop.fs.Path(_pointer_path(target))
    if not fs.exists(jpointer):
        return None
    stream = fs.open(jpointer)
    try:
        # one py4j round trip for the whole file (commons-io ships with
        # Spark), not one per byte
        data = jvm.org.apache.commons.io.IOUtils.toString(stream, "UTF-8")
    finally:
        stream.close()
    return data.strip()


def read_current(spark: SparkSession, target: str) -> DataFrame:
    """Read the pointer-committed current version of ``target``."""
    fs, _, jvm = _fs(spark, target)
    name = _read_pointer(fs, jvm, target)
    if name is None:
        raise FileNotFoundError(f"no committed version for {target}")
    return spark.read.parquet(os.path.join(os.path.dirname(target) or ".", name))


def version_history(spark: SparkSession, target: str) -> list[dict]:
    """List the retained versions of a pointer-published ``target``, newest
    first: ``[{"name", "mtime_ms", "is_current"}, ...]``. The current
    version (whatever the pointer names) is always first; older retained
    versions follow in COMMIT order from the durable commit log — not
    directory mtime, which is write-completion time (ADVICE r4: a slow
    writer can give an older commit a younger mtime), so
    ``version_history()[n]`` is "n commits back" even under interleaved
    publishes. The same ordering drives the retention sweep, so history
    positions and retention agree. Unlogged-but-committed legacy dirs fall
    back to mtime order after the logged ones. The Delta/Iceberg
    ``DESCRIBE HISTORY`` analogue for this plain-parquet publish path."""
    fs, _, jvm = _fs(spark, target)
    current = _read_pointer(fs, jvm, target)
    if current is None:
        raise FileNotFoundError(f"no committed version for {target}")
    rank = {n: i for i, n in enumerate(_read_commit_log(fs, jvm, target))}
    rows = []
    for st in _glob(fs, jvm, f"{target}.v.*"):
        name = st.getPath().getName()
        if rank and not (name == current or name in rank):
            continue  # a log exists, so an unlogged dir is uncommitted debris
        rows.append(
            {
                "name": name,
                "mtime_ms": st.getModificationTime(),
                "is_current": name == current,
                "_order": (rank.get(name, -1), st.getModificationTime()),
            }
        )
    # current first, then the rest newest-commit-first
    rows.sort(key=lambda r: (not r["is_current"], tuple(-x for x in r["_order"])))
    for r in rows:
        del r["_order"]
    return rows


def read_version(spark: SparkSession, target: str, n: int = 0) -> DataFrame:
    """Time travel: read the version ``n`` commits before current (``n=0``
    is :func:`read_current`). Raises ``IndexError`` when ``n`` exceeds the
    retained history (``keep_versions`` at publish time bounds it)."""
    history = version_history(spark, target)
    if n >= len(history):
        raise IndexError(
            f"{target} retains {len(history)} versions; cannot travel back {n}"
        )
    return spark.read.parquet(
        os.path.join(os.path.dirname(target) or ".", history[n]["name"])
    )


def should_reload(spark: SparkSession, memo_path: str, current_len: int) -> bool:
    """True unless the memo records exactly ``current_len`` (the reference's
    ``about``-table size check, ufload/db.py:695-708)."""
    fs, jmemo, _ = _fs(spark, memo_path)
    if not fs.exists(jmemo):
        return True
    row = spark.read.parquet(memo_path).select("length").first()
    return row is None or row["length"] != current_len


def record_loaded(spark: SparkSession, memo_path: str, length: int) -> None:
    """Overwrite the memo with the just-loaded length (ufload/db.py:709-711)."""
    spark.createDataFrame([(length,)], "length long").coalesce(1).write.mode(
        "overwrite"
    ).parquet(memo_path)


def _scratch(name: str) -> str:
    base = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(__file__))),
                        ".scratch")
    os.makedirs(base, exist_ok=True)
    return os.path.join(base, name)


#: per-process memo of published deterministic artifacts, keyed by
#: (artifact name, fixture dir) → the unique scratch path this process
#: published. For bit-deterministic builds (seeded signatures, content-
#: addressed k-means samples, filtered pair graphs — anything whose oracle
#: hash-match proves reproducibility) a repeat invocation in the same
#: process re-reads the first publish instead of rebuilding: the
#: built-once/queried-many lifecycle (reference analog: the download memo,
#: ufload db.py:695-711). Scoped per process AND per unique path, so
#: concurrent processes never share a path — the source_schema_evolution
#: r3 shared-path race class stays impossible.
_MEMO_PUBLISHED: dict[tuple[str, str], str] = {}


def memo_publish(spark: SparkSession, name: str, sf_dir: str, build) -> str:
    """Publish ``build()`` once per (process, fixture dir) under a unique
    scratch path via :func:`stage_and_publish`; return the published path.
    ONLY for deterministic frames — the memo would hide nondeterminism."""
    key = (name, os.path.abspath(sf_dir))
    cached = _MEMO_PUBLISHED.get(key)
    if cached is not None and os.path.exists(os.path.join(cached, "_SUCCESS")):
        return cached
    sfx = os.path.basename(sf_dir.rstrip("/")).replace(".", "_")
    target = _scratch_unique(f"{name}_{sfx}")
    stage_and_publish(spark, build(), target)
    _MEMO_PUBLISHED[key] = target
    return target


def restore_first_viable(
    spark: SparkSession,
    candidates,
    target: str,
    build,
    *,
    expected_rows: int | None = None,
) -> dict:
    """Probe-next-on-failure restore — the reference's candidate loop
    (cli/main.py:288-371: try the newest backup, fall through to the
    next-newest when the restore fails, ``break`` on the first success at
    :367). The candidate list is :func:`backup_candidates_top3`'s output
    for one instance (rank-ordered, ≤ k rows — driver-side control plane);
    ``build(spark, candidate)`` produces the restore DataFrame for one
    candidate; each attempt runs the full stage→audit→publish discipline,
    so a failed candidate leaves no staging debris and never touches
    ``target`` (the audit failure IS the reference's failed-restore
    signal). Returns ``{"published": <candidate name>, "rows": n,
    "attempts": [{"name", "ok", "err"} ...]}``; raises :class:`AuditError`
    when every candidate fails — with ``target`` exactly as it was.
    """
    attempts: list[dict] = []
    for cand in candidates:
        name = cand["name"] if isinstance(cand, dict) else cand.name
        try:
            rows = stage_and_publish(
                spark, build(spark, cand), target, expected_rows=expected_rows
            )
        except AuditError as e:
            attempts.append({"name": name, "ok": False, "err": str(e)})
            continue
        attempts.append({"name": name, "ok": True, "err": None})
        return {"published": name, "rows": rows, "attempts": attempts}
    raise AuditError(
        f"no viable candidate for {target}: "
        + "; ".join(f"{a['name']}: {a['err']}" for a in attempts)
    )


def _scratch_unique(name: str, *, max_age_s: float = 3600) -> str:
    """Per-invocation scratch path ``<base>/<name>.<ms>.<rand>``.

    Registered queries that WRITE before they read must never share a path
    across invocations: the driver may retry or run a query concurrently
    with its oracle pass, and a fixed path lets one invocation observe
    another's mid-rewrite directory (overwrite deletes, append adds —
    exactly the ``source_schema_evolution`` r3 hash-fail). A unique suffix
    makes every invocation's write-then-read self-contained; same-name
    leftovers older than ``max_age_s`` are swept here so debris stays
    bounded without ever racing a live invocation."""
    base = _scratch("")
    now = time.time()
    prefix = f"{name}."
    for entry in os.listdir(base):
        # exact match = debris from the pre-r4 fixed-path scheme
        if entry == name or entry.startswith(prefix):
            p = os.path.join(base, entry)
            try:
                if now - os.path.getmtime(p) >= max_age_s:
                    shutil.rmtree(p, ignore_errors=True)
            except OSError:
                pass
    return _scratch(f"{name}.{int(now * 1000):x}.{uuid.uuid4().hex[:8]}")


@register(
    "loader_staging_publish",
    """
SELECT o_orderstatus, count(*) AS n_orders, round(sum(o_totalprice), 2) AS total
FROM orders WHERE o_totalprice > 0 GROUP BY o_orderstatus
""",
    doc="OP-SNK-1: stage → audit → atomic publish of a table, aggregate read "
    "back from the published copy",
)
def loader_staging_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs the full load lifecycle: writes ``orders`` through the staging
    dir, audits the observed-during-write count against the staged footer
    count (ONE scan of the source — no pre-``count()`` second pass), swaps it
    into place, then aggregates FROM THE PUBLISHED COPY — so the oracle
    checks the data actually made it through the write path byte-correct."""
    src = table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 0)
    target = _scratch_unique(
        f"orders_published_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    stage_and_publish(spark, src, target)
    return (
        spark.read.parquet(target)
        .groupBy("o_orderstatus")
        .agg(
            F.count("*").alias("n_orders"),
            F.round(F.sum("o_totalprice"), 2).alias("total"),
        )
    )


@register(
    "loader_pointer_publish",
    """
SELECT o_orderpriority, count(*) AS n_orders
FROM orders GROUP BY o_orderpriority
""",
    doc="OP-SNK-1 (pointer-commit variant): versioned publish with an atomic "
    "pointer-file swap — readers never observe an absent table",
)
def loader_pointer_publish(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Publishes ``orders`` via :func:`publish_versioned` and aggregates from
    :func:`read_current` — the crash-window-free publish path."""
    src = table(spark, sf_dir, "orders")
    target = _scratch_unique(
        f"orders_versioned_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    publish_versioned(spark, src, target)
    return (
        read_current(spark, target)
        .groupBy("o_orderpriority")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "loader_time_travel",
    """
SELECT o_orderstatus, count(*) AS n_orders
FROM orders GROUP BY o_orderstatus
""",
    doc="OP-SNK-1 (time travel): two pointer-publishes, then read_version(1) "
    "returns the first snapshot intact — the current pointer names the second",
)
def loader_time_travel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Version time travel over the pointer-publish path: publish all of
    ``orders`` (v1), then a filtered half (v2, now current), then read ONE
    COMMIT BACK. The oracle aggregates the full table — matching proves the
    older immutable version survived the second publish untouched, i.e. the
    retention story (`keep_versions`) actually yields usable history, not
    just undeleted bytes. ``read_current`` would see the filtered v2."""
    src = table(spark, sf_dir, "orders")
    target = _scratch_unique(
        f"orders_history_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    publish_versioned(spark, src, target, keep_versions=2)
    publish_versioned(
        spark, src.where(F.col("o_totalprice") > 100000), target, keep_versions=2
    )
    return (
        read_version(spark, target, 1)
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_orders"))
    )


@register(
    "loader_version_diff",
    """
SELECT o_orderstatus,
       count(*) FILTER (WHERE o_totalprice <= 100000) AS n_removed,
       CAST(0 AS BIGINT) AS n_added
FROM orders
GROUP BY o_orderstatus
""",
    doc="OP-SNK-1 (ops surface): key-level diff of two published versions — "
    "what a publish changed, from retained history alone",
)
def loader_version_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The audit question every versioned sink gets asked: WHAT CHANGED in
    the last publish? Publishes all of ``orders`` (v1) then the
    >100k-price subset (v2, current), and computes the per-status diff via
    two anti-joins on the primary key between ``read_version(1)`` and
    ``read_current`` — removed = in-previous-not-in-current, added = the
    converse. The oracle derives the same counts straight from the fixture
    predicate (everything ≤ 100k was removed, nothing added), so a
    hash-match proves retained history supports EXACT change accounting,
    not just snapshot reads. Anti-joins shuffle on the key once each; at
    scale both sides are parquet scans of retained versions — no state
    beyond the versions themselves (reference analog: the archive merge's
    PK reconciliation, db.py:805-815, applied across time instead of
    across databases)."""
    src = table(spark, sf_dir, "orders")
    target = _scratch_unique(
        f"orders_diffhist_{os.path.basename(sf_dir.rstrip('/'))}"
    )
    publish_versioned(spark, src, target, keep_versions=2)
    publish_versioned(
        spark, src.where(F.col("o_totalprice") > 100000), target, keep_versions=2
    )
    prev = read_version(spark, target, 1).select("o_orderkey", "o_orderstatus")
    cur = read_current(spark, target).select("o_orderkey", "o_orderstatus")
    removed = (
        prev.join(cur.select("o_orderkey"), "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_removed"))
    )
    added = (
        cur.join(prev.select("o_orderkey"), "o_orderkey", "left_anti")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_added"))
    )
    statuses = prev.select("o_orderstatus").union(cur.select("o_orderstatus")).distinct()
    return (
        statuses.join(removed, "o_orderstatus", "left")
        .join(added, "o_orderstatus", "left")
        .select(
            "o_orderstatus",
            F.coalesce("n_removed", F.lit(0)).alias("n_removed"),
            F.coalesce("n_added", F.lit(0)).alias("n_added"),
        )
    )


def compact_published(
    spark: SparkSession,
    target: str,
    *,
    target_bytes: int = 32 * 1024 * 1024,
    keep_versions: int = 2,
) -> dict:
    """Execute the small-file compaction the planner
    (`layout_compaction_plan`, listing.py) plans: rewrite the CURRENT
    pointer-published version of ``target`` into ceil(bytes/target_bytes)
    files and commit the rewrite as a new version through the same
    audit-gated pointer publish — identical rows, fewer files, zero
    reader-visible gap, and the previous (fragmented) version stays
    retained for time travel. ``keep_versions`` passes through to
    `publish_versioned` so compaction can never silently shrink a table
    whose owner retains more history than the default 2. Returns
    ``{"files_before", "files_after", "bytes", "rows"}``.

    The audit is the loader's own: the rewrite scan's observed count must
    match the staged footers, and `publish_versioned` refuses empty or
    short writes, so a failed compaction leaves the fragmented version
    live and untouched (the stage→audit→publish discipline; reference
    ufload/db.py:179-208 posture).

    At cluster scale this is the nightly bin-packing job: the byte size
    comes from the version's file metadata (no data scan), the rewrite is
    one ``repartition(n)`` pass, and target_bytes matches
    ``spark.sql.files.maxPartitionBytes`` so downstream scans get one
    split per file.
    """
    import math

    fs, _, jvm = _fs(spark, target)
    current = _read_pointer(fs, jvm, target)
    if current is None:
        raise AuditError(f"{target} has no published version to compact")
    version_dir = os.path.join(os.path.dirname(target), current)
    jdir = jvm.org.apache.hadoop.fs.Path(version_dir)
    files = [
        st
        for st in fs.listStatus(jdir)
        if st.getPath().getName().endswith(".parquet")
    ]
    total_bytes = sum(st.getLen() for st in files)
    n_out = max(1, math.ceil(total_bytes / target_bytes))
    df = spark.read.parquet(version_dir)
    rows = publish_versioned(
        spark, df.repartition(n_out), target, keep_versions=keep_versions
    )
    new_current = _read_pointer(fs, jvm, target)
    new_dir = os.path.join(os.path.dirname(target), new_current)
    jnew = jvm.org.apache.hadoop.fs.Path(new_dir)
    files_after = sum(
        1
        for st in fs.listStatus(jnew)
        if st.getPath().getName().endswith(".parquet")
    )
    return {
        "files_before": len(files),
        "files_after": files_after,
        "bytes": total_bytes,
        "rows": rows,
    }
