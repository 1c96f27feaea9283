from snapflow_spark.cli import main

raise SystemExit(main())
