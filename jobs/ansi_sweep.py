import sys
sys.path.insert(0, "/root/repo")
import __spark_entry__ as m
from pyspark.sql import SparkSession
import duckdb

SF = "/root/testdata/sf0.01"
TABLES = "region nation customer supplier part orders lineitem events documents embeddings".split()

# driver replica: default Spark 4 session (ANSI ON), no builder tuning
spark = (SparkSession.builder.appName("ansisweep").master("local[32]")
         .config("spark.sql.shuffle.partitions", "32")
         .config("spark.driver.memory", "6g")
         .config("spark.ui.enabled", "false")
         .getOrCreate())
spark.sparkContext.setLogLevel("ERROR")
print("ANSI =", spark.conf.get("spark.sql.ansi.enabled"), flush=True)
qs = m.queries(); oq = m.oracle_sql()
bad = []
for name, fn in qs.items():
    try:
        df = fn(spark, SF)
        cols = sorted(df.columns)
        s = sorted(tuple(map(str, r)) for r in df.select(*cols).collect())
        if name not in oq:
            print(f"ROWSONLY {name} {len(s)}", flush=True)
            continue
        con = duckdb.connect()
        for t in TABLES:
            con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')")
        res = con.sql(oq[name])
        ocols = sorted(res.columns)
        o = sorted(tuple(map(str, r)) for r in con.sql(f"SELECT {', '.join(ocols)} FROM res").fetchall())
        ok = (s == o) and (cols == ocols)
        if not ok:
            bad.append(name)
        print(f"{'PASS' if ok else 'FAIL'} {name} {len(s)}/{len(o)}", flush=True)
    except Exception as e:
        bad.append(name)
        print(f"ERR {name} {e.__class__.__name__}: {str(e)[:200]}", flush=True)
print("SWEEP_DONE total=%d bad=%s" % (len(qs), bad), flush=True)
