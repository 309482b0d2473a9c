from .mesh import make_mesh, analyze_batch_sharded, dryrun_multichip
