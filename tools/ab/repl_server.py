"""Long-lived TPU experiment server: preloads the bench state once, then
executes job files dropped into /tmp/tpujobs (globals shared across jobs)."""
import os, time, traceback
exec(open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "repl_setup.py")).read())
__jobdir__ = "/tmp/tpujobs"; __donedir__ = __jobdir__ + "/done"
os.makedirs(__donedir__, exist_ok=True)
print("READY", flush=True)
while True:
    # dunder names: job sources exec into these same globals, so plain
    # loop variables (j, p, src) would be clobbered by job-defined names
    for __job__ in sorted(
        f for f in os.listdir(__jobdir__) if f.endswith(".py")
    ):
        __path__ = os.path.join(__jobdir__, __job__)
        # move FIRST so a crashing job can't re-run in a loop
        os.replace(__path__, os.path.join(__donedir__, __job__))
        print(f"=== RUN {__job__} ===", flush=True)
        try:
            exec(open(os.path.join(__donedir__, __job__)).read(), globals())
        except Exception:
            traceback.print_exc()
        print(f"=== DONE {__job__} ===", flush=True)
    time.sleep(2)
