from stable_renderer_tpu.cli import main

raise SystemExit(main())
