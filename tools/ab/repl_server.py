"""Long-lived TPU experiment server: preloads the bench state once, then
executes job files dropped into /tmp/tpujobs (globals shared across jobs)."""
import os, time, traceback
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "repl_setup.py")).read())
jobdir = "/tmp/tpujobs"; donedir = jobdir + "/done"
os.makedirs(donedir, exist_ok=True)
print("READY", flush=True)
while True:
    jobs = sorted(f for f in os.listdir(jobdir) if f.endswith(".py"))
    for j in jobs:
        p = os.path.join(jobdir, j)
        src = open(p).read()
        print(f"=== RUN {j} ===", flush=True)
        try:
            exec(src, globals())
        except Exception:
            traceback.print_exc()
        print(f"=== DONE {j} ===", flush=True)
        os.replace(p, os.path.join(donedir, j))
    time.sleep(2)
