"""CPU-forced launcher for examples/phantom_sanity.py (keeps the TPU free)."""
import jax
jax.config.update("jax_platforms", "cpu")
import sys, runpy, os
sys.argv = ["phantom_sanity.py"]
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
runpy.run_path(os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                            "examples", "phantom_sanity.py"), run_name="__main__")
