from sibeliaz_tpu.cli import main

main()
