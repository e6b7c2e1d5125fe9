output "namespace" {
  value = kubernetes_namespace.walden.metadata[0].name
}

output "thrift_jdbc_uri" {
  # BI clients (Superset etc.) connect here — the trino://trino:80/hive
  # replacement (reference: tf/superset/superset.tf:62).
  value = module.engine.thrift_uri
}

output "s3_endpoint" {
  value = module.minio.endpoint
}
