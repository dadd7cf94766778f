"""Head-to-head benchmark: reference stack (SQLite + sort) vs the engine
on identical reference-shaped posts tables. Produces the BENCH.md table.
Usage: python jobs/headtohead_vs_sqlite.py  (~10 min at 10M rows)"""
import sys, time, sqlite3, os
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import numpy as np
from tgdigest_spark.datagen import gen_posts

t0 = time.time()
posts = gen_posts(n_posts=10_000_000, seed=42)
print(f"gen 10M posts {time.time()-t0:.1f}s rows={len(posts)}", flush=True)

db = "/tmp/ref_posts_10m.db"
if os.path.exists(db): os.remove(db)
con = sqlite3.connect(db)
con.execute("""CREATE TABLE posts (channel TEXT, id INT, date INT, views INT,
  forwards INT, replies INT, reactions INT, message TEXT, grouped_id INT,
  PRIMARY KEY (channel, id))""")
con.execute("CREATE INDEX idx_cd ON posts(channel, date, id)")
pdf = posts.drop_duplicates(["channel","id"]).copy()
pdf["date_i"] = pdf["date"].astype("int64") // 10**6
def col(c):
    return [None if v is None or (isinstance(v, float) and np.isnan(v)) else int(v)
            for v in pdf[c].astype("float64").where(pdf[c].notna(), np.nan)]
rows = list(zip(pdf.channel, pdf.id, pdf.date_i, col("views"), col("forwards"),
                col("replies"), col("reactions"), pdf.message, col("grouped_id")))
t0=time.time()
con.executemany("INSERT OR REPLACE INTO posts VALUES (?,?,?,?,?,?,?,?,?)", rows)
con.commit()
print(f"sqlite load {time.time()-t0:.1f}s", flush=True)

FROM_I = int(np.datetime64("2024-03-01").astype("datetime64[s]").astype(int))
TO_I   = int(np.datetime64("2025-09-01").astype("datetime64[s]").astype(int))
def sqlite_digest(ch):
    out = {}
    for m in ("replies","reactions","forwards","views"):
        out[m] = con.execute(f"""SELECT id, {m} FROM posts
          WHERE channel=? AND date BETWEEN ? AND ? AND {m} IS NOT NULL
          ORDER BY {m} DESC, id ASC LIMIT 3""", (ch, FROM_I, TO_I)).fetchall()
    return out
for ch in ("channel0","channel1","channel2"): sqlite_digest(ch)
t0=time.time()
for ch in ("channel0","channel1","channel2"): sqlite_digest(ch)
print(f"SQLite ORDER-BY-LIMIT digest @10M: {time.time()-t0:.2f}s/run", flush=True)

def sqlite_fetch_sort(ch):
    rows = con.execute("""SELECT id, views, forwards, replies, reactions FROM posts
      WHERE channel=? AND date BETWEEN ? AND ? ORDER BY date, id""",
      (ch, FROM_I, TO_I)).fetchall()
    out = {}
    for i, m in enumerate(("views","forwards","replies","reactions")):
        out[m] = sorted((r for r in rows if r[1+i] is not None), key=lambda r: (-r[1+i], r[0]))[:3]
    return out
sqlite_fetch_sort("channel0")
t0=time.time()
for ch in ("channel0","channel1","channel2"): sqlite_fetch_sort(ch)
print(f"SQLite fetch+py-sort @10M: {time.time()-t0:.2f}s/run", flush=True)
con.close()

pq = "/tmp/posts_10m.parquet"
posts.to_parquet(pq, index=False, row_group_size=262144)
from tgdigest_spark.session import get_spark
from tgdigest_spark.operators.digest import top_posts
spark = get_spark("h2h10", cores=32, shuffle_partitions=32)
df = spark.read.parquet(pq)
FROM_TS, TO_TS = "2024-03-01 00:00:00", "2025-09-01 00:00:00"
top_posts(df, 3, FROM_TS, TO_TS).collect()
t0=time.time()
for _ in range(3):
    r = top_posts(df, 3, FROM_TS, TO_TS).collect()
print(f"Spark top_posts full pipeline @10M: {(time.time()-t0)/3:.2f}s/run", flush=True)
top_posts(df, 3, FROM_TS, TO_TS, dedup=False).collect()
t0=time.time()
for _ in range(3):
    top_posts(df, 3, FROM_TS, TO_TS, dedup=False).collect()
print(f"Spark top-k only @10M: {(time.time()-t0)/3:.2f}s/run", flush=True)
spark.stop()
