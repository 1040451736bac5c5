#!/bin/bash
# r05 drain-abort bisect ladder: each rung a fresh process (caps read at trace time)
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%T)" | tee -a artifacts/drain/r05_ladder.log
  env "$@" timeout 3000 python tools/ab/drain_repro.py ${SIZE:-1920x1080} 262144 ${BOUNCES:-4} 2>&1 | grep -v "^WARNING" | tee -a artifacts/drain/r05_ladder.log
}
SIZE=512x512      run small_anyhit      VRT_DRAIN_CLOSEST=off VRT_DRAIN_ANYHIT=16,128
BOUNCES=1         run b1_anyhit         VRT_DRAIN_CLOSEST=off VRT_DRAIN_ANYHIT=16,128
run norekey_anyhit    VRT_DRAIN_CLOSEST=off VRT_DRAIN_ANYHIT=16,128 VRT_DRAIN_REKEY=0
run nosort_anyhit     VRT_DRAIN_CLOSEST=off VRT_DRAIN_ANYHIT=16,128 VRT_DEBUG_NO_SORT=1
run splitgather_anyhit VRT_DRAIN_CLOSEST=off VRT_DRAIN_ANYHIT=16,128 VRT_DRAIN_SPLITGATHER=1
run closest_only      VRT_DRAIN_CLOSEST=256,1024 VRT_DRAIN_ANYHIT=off
echo "=== ladder done $(date +%T)" | tee -a artifacts/drain/r05_ladder.log
