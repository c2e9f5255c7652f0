import duckdb, sys, glob, os
sys.path.insert(0, '/root/repo')
import __spark_entry__ as E
sf = '/root/testdata/sf0.01'
con = duckdb.connect()
for t in "region nation customer supplier part orders lineitem events documents embeddings".split():
    p = os.path.join(sf, t + '.parquet')
    if os.path.exists(p):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{p}')")
bad = []
oracles = E.oracle_sql()
for name, sql in oracles.items():
    try:
        rel = con.sql(sql)
        types = [str(t) for t in rel.types]
        cols = rel.columns
    except Exception as ex:
        bad.append((name, 'ERR', str(ex)[:120])); continue
    for c, t in zip(cols, types):
        if t in ('HUGEINT', 'UHUGEINT', 'INT128'):
            bad.append((name, c, t))
for b in bad:
    print(b)
print(f"checked {len(oracles)} oracles, {len(bad)} flags")
