from log2sql_spark.cli import main

raise SystemExit(main())
