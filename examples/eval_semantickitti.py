"""SemanticKITTI eval harness shim.

The implementation lives in :mod:`patchworkpp_tpu.cli.eval_semantickitti`
(the ``ppk-eval`` console script).
"""

from patchworkpp_tpu.cli.eval_semantickitti import main

if __name__ == "__main__":
    main()
