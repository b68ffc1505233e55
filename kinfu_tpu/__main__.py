from kinfu_tpu.cli import main

raise SystemExit(main())
