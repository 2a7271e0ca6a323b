"""Streaming-throughput demo shim (native prefetch loader -> jitted engine).

The implementation lives in :mod:`patchworkpp_tpu.cli.stream_bench`
(the ``ppk-stream-bench`` console script).
"""

from patchworkpp_tpu.cli.stream_bench import main

if __name__ == "__main__":
    main()
