import sys; sys.path.insert(0, "/root/repo")
import __spark_entry__ as e, duckdb
from pointdatabase_spark.session import get_spark
s = get_spark('sim', master='local[16]', extra_conf={'spark.ui.enabled':'false','spark.driver.memory':'16g'})
s.sparkContext.setLogLevel("ERROR")
print("entry rows:", e.entry(s).count(), flush=True)
sf='/root/testdata/sf0.01'
con = duckdb.connect()
for t in ['region','nation','customer','supplier','part','orders','lineitem','events','documents','embeddings']:
    con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf}/{t}.parquet')")
def canon(d): return d[sorted(d.columns)].sort_values(by=sorted(d.columns), ignore_index=True)
def eq(a, b):
    if isinstance(a, float) or isinstance(b, float):
        import struct
        try:
            return struct.pack('<d', float(a)) == struct.pack('<d', float(b))
        except (TypeError, ValueError):
            return False
    return a == b
fails = 0
for name, fn in sorted(e.queries().items()):
    try:
        got = canon(fn(s, sf).toPandas())
        sql = e.oracle_sql().get(name)
        if sql is None:
            print("ROWS-ONLY", name, len(got), flush=True); continue
        exp = canon(con.execute(sql).df())
        ok = got.shape==exp.shape and all(
            eq(a, b) for c in got.columns for a,b in zip(got[c],exp[c]))
        if not ok: fails += 1
        print("MATCH" if ok else "FAIL", name, len(got), flush=True)
    except Exception as ex:
        fails += 1
        print("ERROR", name, repr(ex)[:200], flush=True)
print("TOTAL FAILS:", fails, flush=True)
s.stop()
