import duckdb, json, sys, glob, math, os, time
sf = sys.argv[1] if len(sys.argv) > 1 else '/root/testdata/sf0.01'
out = sys.argv[2] if len(sys.argv) > 2 else '/tmp/verify_out'
# stale-dump guard: checking a dump produced by an OLDER SparkEntry
# reports confusing count/hash failures that read like repo defects
# (hit in the round-8 judge session — a previous session's
# /tmp/verify_out said "149 queries"). Identify the dump and refuse
# one older than the contract source.
_osj = f'{out}/oracle_sql.json'
if not os.path.exists(_osj):
    sys.exit(f'selfcheck: no dump at {out} (missing {_osj}) — run: '
             f'sbt "runMain graft.Verify {sf} {out}"')
_entry = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..',
                      'src', 'main', 'scala', 'graft', 'SparkEntry.scala')
def _src_time(path):
    # "when did the contract last CHANGE", not "when was it checked
    # out": a fresh clone stamps every file with the checkout time, so
    # the mtime basis cried stale on every fresh checkout (three rounds
    # running). The last COMMIT touching the file is the change time —
    # unless the working copy is dirty, in which case mtime is the
    # truth (an uncommitted edit postdates any commit).
    import subprocess
    try:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        dirty = subprocess.run(['git', '-C', repo, 'status', '--porcelain', '--', path],
                               capture_output=True, text=True, timeout=10)
        if dirty.returncode == 0 and not dirty.stdout.strip():
            ct = subprocess.run(['git', '-C', repo, 'log', '-1', '--format=%ct', '--', path],
                                capture_output=True, text=True, timeout=10)
            if ct.returncode == 0 and ct.stdout.strip():
                return float(ct.stdout.strip())
    except Exception:
        pass
    return os.path.getmtime(path)
_dump_m, _src_m = os.path.getmtime(_osj), _src_time(_entry)
print(f'dump: {out} (oracle_sql.json mtime '
      f'{time.strftime("%Y-%m-%d %H:%M:%S", time.localtime(_dump_m))})')
if os.path.exists(_entry) and _dump_m < _src_m:
    sys.exit(f'selfcheck: STALE DUMP — {_osj} predates SparkEntry.scala '
             f'(dump {time.strftime("%F %T", time.localtime(_dump_m))} < source '
             f'{time.strftime("%F %T", time.localtime(_src_m))}); re-run: '
             f'sbt "runMain graft.Verify {sf} {out}"')
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
oracle = json.load(open(f'{out}/oracle_sql.json'))
fails = []
for name, sql in sorted(oracle.items()):
    try:
        files = glob.glob(f'{out}/{name}/*.parquet')
        if not files:
            print(f'{name}: NO SPARK OUTPUT'); fails.append(name); continue
        sp = con.execute(f"SELECT * FROM '{out}/{name}/*.parquet'").fetch_df()
        du = con.execute(sql).fetch_df()
        sp = sp.reindex(sorted(sp.columns), axis=1)
        du = du.reindex(sorted(du.columns), axis=1)
        if list(sp.columns) != list(du.columns):
            print(f'{name}: COLS spark={list(sp.columns)} duck={list(du.columns)}'); fails.append(name); continue
        if len(sp) != len(du):
            print(f'{name}: ROWS spark={len(sp)} duck={len(du)}'); fails.append(name); continue
        sp = sp.sort_values(by=list(sp.columns)).reset_index(drop=True)
        du = du.sort_values(by=list(du.columns)).reset_index(drop=True)
        mismatch = 0; first = None
        for c in sp.columns:
            a, b = sp[c], du[c]
            try: neq = ~((a == b) | (a.isna() & b.isna()))
            except Exception: neq = a.astype(str) != b.astype(str)
            n = int(neq.sum())
            if n: 
                mismatch += n
                if first is None:
                    i = neq.idxmax(); first = (c, a[i], b[i])
        if mismatch:
            print(f'{name}: {mismatch} value mismatches, first={first}'); fails.append(name)
        else:
            print(f'{name}: OK ({len(sp)} rows)')
    except Exception as e:
        print(f'{name}: ERROR {str(e).splitlines()[0][:200]}'); fails.append(name)
# doc sync: SURVEY.md's "N declared queries total" must equal the live
# contract (every SparkEntry.queries entry ships an oracle, so the
# oracle dump's size IS the declared-query count) — the count rotted
# silently for three rounds before this check existed
import os, re
root = os.path.join(os.path.dirname(os.path.abspath(__file__)), '..')
# (file, marker regex) — each doc that states the query count is pinned
# to the live contract; README/COVERAGE rotted the same way SURVEY did
# before it was pinned
for fname, pat in [('SURVEY.md',   r'(\d+) declared queries total'),
                   ('README.md',   r'(\d+) named queries'),
                   ('README.md',   r'all (\d+) declared queries'),
                   ('COVERAGE.md', r'(\d+) declared queries \(')]:
    path = os.path.join(root, fname)
    if not os.path.exists(path):
        continue
    m = re.search(pat, open(path).read())
    key = f'{fname}_count_sync'
    if m is None:
        print(f'{fname}: missing marker /{pat}/'); fails.append(key)
    elif int(m.group(1)) != len(oracle):
        print(f'{fname} says {m.group(1)} queries ({pat}); oracle_sql.json has {len(oracle)}')
        fails.append(key)
# the checked-in bench capture must be a REAL capture: a floor probe
# (SPARK_GRAFT_BENCH_FLOOR=1) is shape-identical but measures the
# one-stage harness floor, so committed/diffed it reads as a ~7x
# speedup (r14 advisor)
_bf = os.path.join(root, 'bench_full.json')
if os.path.exists(_bf):
    try:
        if json.load(open(_bf)).get('methodology', {}).get('floor_probe'):
            print('bench_full.json: FLOOR PROBE artifact (methodology.floor_probe='
                  'true) — recapture without SPARK_GRAFT_BENCH_FLOOR')
            fails.append('bench_full_floor_probe')
    except Exception as e:
        print(f'bench_full.json: unreadable ({e})'); fails.append('bench_full_unreadable')
print('---'); print('FAILED:', fails if fails else 'none')
