#!/bin/bash
# r05 drain-abort ladder 2: compiler-vs-runtime + scale-cliff mapping
cd /root/repo
run() {
  name=$1; shift
  echo "=== $name: $* $(date +%T)" | tee -a artifacts/drain/r05_ladder2.log
  env "$@" timeout 3600 python tools/ab/drain_repro.py ${SIZE:-1920x1080} 262144 ${BOUNCES:-4} 2>&1 | grep -v "^WARNING" | tee -a artifacts/drain/r05_ladder2.log
}
# 1. is the 1080p abort a COMPILE failure?
run compileonly_anyhit VRT_DRAIN_CLOSEST=off VRT_DRAIN_ANYHIT=16,128 VRT_DRAIN_COMPILE_ONLY=1
# 2. map the size cliff between 512^2 (pass) and 1080p (abort)
SIZE=1280x720 run mid_anyhit VRT_DRAIN_CLOSEST=off VRT_DRAIN_ANYHIT=16,128
# 3. fewer drain rounds at 1080p: fresh(128) + final uncapped only
run oneround_anyhit VRT_DRAIN_CLOSEST=off VRT_DRAIN_ANYHIT=128
echo "=== ladder2 done $(date +%T)" | tee -a artifacts/drain/r05_ladder2.log
