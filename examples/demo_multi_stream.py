"""Multi-stream demo shim (new capability; see cli/demo_multi_stream.py).

Two adaptive streams share one compiled engine — the one-chip multiplexing
pattern from ROOFLINE.md. Installed as ``ppk-demo-multi-stream``.
"""

from patchworkpp_tpu.cli.demo_multi_stream import main

if __name__ == "__main__":
    main()
