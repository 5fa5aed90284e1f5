from weather_stream_processor_spark.cli import main

raise SystemExit(main())
