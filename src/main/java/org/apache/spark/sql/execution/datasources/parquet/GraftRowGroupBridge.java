package org.apache.spark.sql.execution.datasources.parquet;

import java.io.IOException;

import org.apache.parquet.hadoop.ParquetFileReader;
import org.apache.parquet.schema.MessageType;

/**
 * Java bridge for the package-private {@code ParquetRowGroupReader}
 * plumbing: initializes a {@link VectorizedParquetRecordReader} over an
 * already-opened (and row-group-filtered) {@link ParquetFileReader}.
 * Java because Scala cannot reference the package-private nested types
 * even from the same package.
 */
public final class GraftRowGroupBridge {
  private GraftRowGroupBridge() {}

  public static void init(
      VectorizedParquetRecordReader reader,
      MessageType fileSchema,
      MessageType requestedSchema,
      final ParquetFileReader fileReader,
      int totalRowCount) throws IOException {
    reader.initialize(
        fileSchema,
        requestedSchema,
        new SpecificParquetRecordReaderBase.ParquetRowGroupReader() {
          @Override
          public org.apache.parquet.column.page.PageReadStore readNextRowGroup()
              throws IOException {
            return fileReader.readNextRowGroup();
          }

          @Override
          public void close() throws IOException {
            fileReader.close();
          }
        },
        totalRowCount);
  }
}
