from poms_tpu.oracle.mg_oracle import OracleMG
