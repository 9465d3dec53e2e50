from vector2dggs_spark.cli import main

raise SystemExit(main())
