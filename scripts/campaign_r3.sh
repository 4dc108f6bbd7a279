#!/bin/bash
# Round-3 measurement campaign: scaling gate at 4M payloads, then 10M headroom.
# Each measurement is a cold process pinned with taskset (bench.py protocol).
set -x
cd /root/repo
OUT=bench_runs/r03

taskset -c 0-31 python scripts/cluster_job.py 32 4000000 42 4 > $OUT/scale4m_32c.json 2> /tmp/scale4m_32c.log
taskset -c 0-7  python scripts/cluster_job.py 8  4000000 42 3 > $OUT/scale4m_8c.json  2> /tmp/scale4m_8c.log

rm -rf /tmp/biblib_corpus_v5_10000000_42.parquet
taskset -c 0-31 python scripts/cluster_job.py 32 10000000 42 2 > $OUT/headroom_32c_10M.json 2> /tmp/headroom_10m.log
echo CAMPAIGN_DONE
